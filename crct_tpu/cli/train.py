"""Training CLI (reference CRCT/train.py).

Usage parity:
    python -m crct_tpu.cli.train -qa_file qa_pairs_V1_train.npy \
        -dataset_config config/plotqa.json -batch_size 80 -ddp

``-ddp`` shards the global batch over all local devices (one process per
host; multi-host via jax.distributed). ``-world_size``/``-num_proc`` are
accepted for CLI compatibility but the device mesh is discovered from JAX.
"""

from __future__ import annotations

import pprint

import numpy as np

from crct_tpu.config import read_command_line
from crct_tpu.data.dataset import ChartQADataset, DataLoader
from crct_tpu.train.eval_loop import (evaluate, print_acc_table,
                                      print_breakdown_table)
from crct_tpu.train.train_loop import run_training
from crct_tpu.utils.logging import log_line


def in_train_eval(trainer, dataset, epoch_id):
    """<=500-sample validation eval each epoch (reference train.py:294-338)."""
    params = dict(trainer.params_dict)
    # in-train eval always uses the reference protocol: the fast-scorer
    # head doesn't exist in a training param tree (it trains separately,
    # cli.train_fast_scorer)
    params["fast_scorer"] = False
    dataset.split = params["eval_set"]
    dataset.get_all_answers = True
    rng = np.random.default_rng(params.get("seed", 0) + epoch_id)
    idx = rng.permutation(len(dataset))[:500]
    from crct_tpu.train.eval_loop import resolve_eval_question_batch
    loader = DataLoader(dataset, batch_size=resolve_eval_question_batch(params),
                        shuffle=False, num_workers=params.get("num_workers", 8) or 1,
                        drop_last=False, indices=idx)
    total, breakdown, _ = evaluate(
        loader, dataset, params, trainer.model, trainer.params,
        csv=False, log_print=lambda m: log_line(params, m))
    print_acc_table(lambda m: log_line(params, m), total)
    if params["dataset"] != "figure_qa":
        print_breakdown_table(params, lambda m: log_line(params, m), breakdown)
    dataset.get_all_answers = False
    _tb_eval_scalars(trainer, params, total, epoch_id)
    return total


def _tb_eval_scalars(trainer, params, total, epoch_id):
    """Per-epoch eval scalars + hparams (reference train.py:340-350)."""
    from crct_tpu.train.train_loop import _maybe_tensorboard
    writer = _maybe_tensorboard(params)
    if writer is None:
        return
    def frac(row):
        return float(total[row, 0] / total[row, 1]) if total[row, 1] else 0.0
    writer.add_scalar("Accuracy/Eval Total Acc", frac(4), epoch_id)
    writer.add_scalar("Accuracy/Eval Reg Acc", frac(2), epoch_id)
    writer.add_scalar("Accuracy/Eval nsp Acc", frac(0), epoch_id)
    hparams = {k: v for k, v in params.items()
               if isinstance(v, (int, float, str, bool))}
    try:
        writer.add_hparams(hparams, {"hparam/Eval_acc": frac(4)})
    except Exception:
        pass
    writer.flush()


def main(argv=None):
    params = read_command_line(argv)
    from crct_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed(params)
    pprint.pprint({k: v for k, v in params.items() if k != "dvqa_floats"})
    splits = ["train"] if params["pretrain"] else ["train", params["eval_set"]]
    dataset = ChartQADataset(params, splits)
    run_training(params, dataset,
                 eval_fn=None if params["no_eval"] else in_train_eval)


if __name__ == "__main__":
    main()
