"""Sweep the auto eval row-chunk size through the REAL ``evaluate()``.

docs/KERNELS.md measured (r3) that a 120-row eval step costs ~17% less
PER ROW than a 480-row step at the tunnel's dispatch latency — but the
auto default (``EVAL_AUTO_ROWS_PER_CHIP`` = 480) was never re-derived
from an end-to-end measurement. This sweeps chunk in {120, 240, 480,
960} through ``evaluate()`` on the full reference protocol (the same
synthetic flagship-shape setup as ``bench.bench_fast_topk8``), letting
``resolve_eval_question_batch`` follow each chunk the way the default
CLI would, and prints a table + winner. The reference analogue of this
economics is the per-candidate fan-out loop, CRCT/evaluation.py:243-262.

Usage: python tools/eval_chunk_sweep.py [--questions 240] [--chunks 120,240,480,960]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--questions", type=int, default=240)
    ap.add_argument("--chunks", default="120,240,480,960")
    ap.add_argument("--feat-dim", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed passes per chunk size (max-rate kept: "
                         "tunnel contention only ever slows a pass down)")
    args = ap.parse_args(argv)
    chunk_list = [int(c) for c in args.chunks.split(",")]

    import tempfile

    import jax
    import jax.numpy as jnp

    from crct_tpu.config import CRCTModelConfig, default_params
    from crct_tpu.data.dataset import ChartQADataset, DataLoader
    from crct_tpu.data.synthetic import generate_dataset
    from crct_tpu.models.crct import CRCTModel
    from crct_tpu.train import eval_loop as el

    with tempfile.TemporaryDirectory() as td:
        n_img = 16
        cfg_ds = generate_dataset(os.path.join(td, "d"), n_images=n_img,
                                  division=4, feat_dim=args.feat_dim,
                                  n_questions=-(-args.questions // n_img))
        params = default_params(
            figure_feat_path=cfg_ds["figure_feat_path"],
            qa_parent_dir=cfg_ds["qa_parent_dir"],
            dataset_config={"dataset_files_divisions":
                            cfg_ds["dataset_files_divisions"]},
            splits=cfg_ds["splits"], categories=cfg_ds["categories"],
            eval_set="test", eval_batch_size=None)
        model = CRCTModel(config=CRCTModelConfig(dtype="bfloat16"),
                          categories=params["categories"])

        mp = None
        rows_table = []
        for chunk in chunk_list:
            el.EVAL_AUTO_ROWS_PER_CHIP = chunk
            # the loader batch follows the chunk exactly as the default
            # CLI would (resolve_eval_question_batch = chunk//12 capped)
            ds = ChartQADataset(params, ["test"], init_split="test")
            ds.get_all_answers = True
            loader = DataLoader(ds, batch_size=el.resolve_eval_question_batch(
                                    params),
                                shuffle=False, drop_last=False,
                                num_workers=1)
            batches = [{k: np.asarray(v) for k, v in b.items()}
                       for b in loader]
            n_q = sum(len(np.asarray(b["id"]).reshape(-1)) for b in batches)
            if mp is None:
                rows, _ = el._flatten_valid_rows(batches[0])
                chunked, _ = next(el._chunk_rows(rows, chunk))
                mp = jax.jit(functools.partial(model.init, train=False))(
                    {"params": jax.random.key(4)}, chunked)["params"]
            el.evaluate(batches, ds, dict(params), model, mp, csv=False,
                        log_print=lambda m: None)        # compile pass
            best = 0.0
            for _ in range(max(1, args.repeats)):
                t0 = time.perf_counter()
                el.evaluate(batches, ds, dict(params), model, mp, csv=False,
                            log_print=lambda m: None)
                best = max(best, n_q / (time.perf_counter() - t0))
            rows_table.append({"chunk": chunk,
                               "loader_batch": el.resolve_eval_question_batch(
                                   params),
                               "questions": n_q,
                               "questions_per_sec_per_chip": round(best, 2)})
            print(json.dumps(rows_table[-1]), flush=True)

        winner = max(rows_table, key=lambda r: r["questions_per_sec_per_chip"])
        print(json.dumps({"winner_chunk": winner["chunk"],
                          "table": rows_table}))


if __name__ == "__main__":
    main()
