"""Train the opt-in fast-scorer head on a trained CRCT checkpoint.

    python -m crct_tpu.cli.train_fast_scorer -qa_file qa_pairs.npy \
        -dataset_config config/plotqa.json -start_checkpoint trained.ckpt \
        -save_name fs_run [-fs_steps 2000] [-fs_lr 1e-3]

Backbone weights come from ``-start_checkpoint`` and stay frozen; only the
light candidate head trains (listwise CE over each question's candidate
set). The output checkpoint contains backbone + head; evaluate with
``-fast_scorer -start_checkpoint <out>`` for one-backbone-pass-per-question
eval instead of the x120 candidate fan-out.
"""

from __future__ import annotations

import os
import pprint

import jax
import numpy as np

from crct_tpu.config import read_command_line
from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.models.crct import build_model
from crct_tpu.train.eval_loop import build_fast_rows
from crct_tpu.train.fast_scorer_train import train_fast_scorer
from crct_tpu.utils.checkpoint import (load_checkpoint, save_checkpoint,
                                       transfer_params)


def main(argv=None):
    params = read_command_line(argv)
    params["fast_scorer"] = True
    pprint.pprint({k: v for k, v in params.items() if k != "dvqa_floats"})

    dataset = ChartQADataset(params, ["train"])
    dataset.get_all_answers = True
    model = build_model(params)

    import jax.numpy as jnp
    sample = next(iter(DataLoader(dataset, batch_size=2, shuffle=False,
                                  num_workers=1, drop_last=True)))
    rows = {k: jnp.asarray(v) for k, v in build_fast_rows(sample).items()}
    import functools
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.key(0)}, rows)
    model_params = variables["params"]
    if params.get("start_checkpoint"):
        loaded = load_checkpoint(params["start_checkpoint"])
        model_params, _ = transfer_params(
            model_params, loaded.get("model_state_dict", loaded))

    merged, last_ce = train_fast_scorer(
        params, dataset, model, model_params,
        steps=params["fs_steps"], lr=params["fs_lr"],
        batch_questions=max(2, params["batch_size"] // 4))

    out = os.path.join(params["save_path"], "fast_scorer.ckpt")
    save_checkpoint(out, jax.device_get(merged))
    print(f"final CE: {last_ce}")
    print(f"     --> Saved model as: {out}")
    return out


if __name__ == "__main__":
    main()
