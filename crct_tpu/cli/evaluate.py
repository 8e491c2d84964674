"""Full evaluation CLI (reference CRCT/evaluation.py).

Usage parity:
    python -m crct_tpu.cli.evaluate -qa_file qa_pairs_test.npy \
        -dataset_config config/plotqa.json -eval_set test \
        -start_checkpoint crct.ckpt

Resumable: completed question ids are re-read from the per-rank CSVs and
excluded from the index set; accumulator tensors reload from snapshots
(reference evaluation.py:69-126,146-153).

Batch answer serving: `-predictions_out answers.jsonl` additionally writes
one JSON record per question (answer, cls_output, reg_output, confidence,
gt_answer) — the demo bot's pred dict (reference Interactive_demo.py:
161-247) at full eval-loop throughput instead of one question per REPL
turn. Composes with -fast_scorer / -fast_scorer_topk.
"""

from __future__ import annotations

import pprint

import jax
import numpy as np

from crct_tpu.config import read_command_line
from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.models.crct import build_model
from crct_tpu.train.eval_loop import (evaluate, get_prev_done_ids,
                                      make_histogram_png, print_acc_table,
                                      print_breakdown_table)
from crct_tpu.utils.checkpoint import load_checkpoint, transfer_params


def load_eval_model(params, sample_batch):
    """Build the model + restore checkpoint weights (transfer mode)."""
    import jax.numpy as jnp
    from crct_tpu.train.train_loop import device_batch
    import functools
    model = build_model(params)
    if params.get("fast_scorer"):
        # fast rows carry cand_tokens/cand_valid/attention_mask, which
        # device_batch's STEP_KEYS filter would drop (the head would never
        # be initialized)
        init_batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    else:
        init_batch = jax.tree.map(jnp.asarray, device_batch(sample_batch))
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, init_batch)
    model_params = variables["params"]
    if params.get("start_checkpoint"):
        loaded = load_checkpoint(params["start_checkpoint"])
        src = loaded.get("model_state_dict", loaded)
        model_params, _ = transfer_params(model_params, src)
    n = sum(np.size(x) for x in jax.tree.leaves(model_params))
    print(f"Model's parameters: {n}")
    return model, model_params


def main(argv=None):
    params = read_command_line(argv)
    from crct_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed(params)
    pprint.pprint({k: v for k, v in params.items() if k != "dvqa_floats"})

    dataset = ChartQADataset(params, params["eval_set"],
                             init_split=params["eval_set"])
    dataset.get_all_answers = True

    done_ids = get_prev_done_ids(params)
    cont_eval = done_ids is not None
    indices = None
    if cont_eval:
        print("-" * 20, f"Done Ids: {len(done_ids)}", "-" * 20, flush=True)
        indices = np.array(sorted(set(range(len(dataset))) - set(done_ids.tolist())))

    from crct_tpu.train.eval_loop import (resolve_eval_chunk,
                                          resolve_eval_question_batch)
    loader = DataLoader(dataset, batch_size=resolve_eval_question_batch(params),
                        shuffle=False, drop_last=False,
                        num_workers=params.get("num_workers", 8) or 1,
                        indices=indices,
                        # per-host question sharding (DistributedSampler
                        # parity, evaluation.py:153)
                        num_shards=jax.process_count(),
                        shard_index=jax.process_index())
    sample = next(iter(DataLoader(dataset, batch_size=1, shuffle=False,
                                  num_workers=1, drop_last=False)))
    # the eval step consumes flattened candidate rows (or per-question rows
    # with candidate tokens in -fast_scorer mode)
    from crct_tpu.train.eval_loop import (_chunk_rows, _flatten_valid_rows,
                                          build_fast_rows)
    if params.get("fast_scorer"):
        rows = build_fast_rows(sample)
    else:
        rows, _ = _flatten_valid_rows(sample)
    chunked, _ = next(_chunk_rows(rows, resolve_eval_chunk(params)))
    model, model_params = load_eval_model(params, chunked)

    on_predictions = pred_file = None
    if params.get("predictions_out"):
        import json
        path = params["predictions_out"]
        if jax.process_count() > 1:   # one file per host, like the eval CSVs
            path += f".rank{jax.process_index()}"
        pred_file = open(path, "a" if cont_eval else "w")

        def on_predictions(recs):
            for r in recs:
                pred_file.write(json.dumps(r, default=str) + "\n")
            pred_file.flush()

    try:
        total, breakdown, histogram = evaluate(
            loader, dataset, params, model, model_params,
            progress=params["eval_type"], csv=True, cont_eval=cont_eval,
            on_predictions=on_predictions)
    finally:
        if pred_file is not None:
            pred_file.close()

    print_acc_table(print, total)
    if "plotqa" in params["dataset"]:
        print_breakdown_table(params, print, breakdown)
        make_histogram_png(params, histogram)
    print("Done evaluation", flush=True)
    return total, breakdown


if __name__ == "__main__":
    main()
