"""Benchmark: CRCT QA-stage training throughput (QA-pairs/sec/chip).

Runs the flagship full-size model (config/vilbert.json scale: 12L/768 text,
6L/1024 vision, 6 co-attention blocks at bi_hidden 1024) through the jitted
data-parallel training step at the reference's per-device batch (80,
README.md:69) on PlotQA shapes (max_seq_len 124, max_vis_features 44), bf16
activations.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``--pallas`` switches the attention cores to the Pallas kernels; measured
slower than XLA at CRCT's tiny sequence lengths (see docs/KERNELS.md), so
the headline number uses the default XLA path.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the denominator is a documented estimate of the PyTorch-DDP per-GPU training
throughput of the same model/batch on the reference's 4-GPU rig:
~110M-param two-stream BERT at batch 80, fp16 autocast ~= 0.7s/step/GPU
=> ~115 QA-pairs/sec/GPU. The BASELINE.json north star (>=4x per chip) is
met when vs_baseline >= 4.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_QA_PAIRS_PER_SEC_PER_GPU = 115.0
BATCH_PER_CHIP = 80
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def main(pallas: bool = False) -> None:
    import jax
    import optax
    from __graft_entry__ import _synthetic_step_batch
    from crct_tpu.config import CRCTModelConfig
    from crct_tpu.models.crct import CRCTModel
    from crct_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from crct_tpu.train.optimizer import make_optimizer
    from crct_tpu.train.train_loop import make_train_step

    n_chips = len(jax.devices())
    mesh = make_mesh()

    cfg = CRCTModelConfig(dtype="bfloat16", use_pallas_attention=pallas)
    model = CRCTModel(config=cfg, categories=228)
    rng = np.random.default_rng(0)
    B = BATCH_PER_CHIP * n_chips
    batch = _synthetic_step_batch(rng, B=B, L=124, R=44,
                                  vdim=cfg.v_feature_size,
                                  vocab=cfg.vocab_size, cats=228)
    import functools
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch)
    params_dict = dict(lr=2e-5, image_lr=2e-5, min_lr=1.3e-5, warmup=3000,
                       wd=0.01)
    tx = make_optimizer(params_dict, variables["params"], iters_per_epoch=1000)
    params = replicate(variables["params"], mesh)
    opt_state = replicate(tx.init(variables["params"]), mesh)
    db = shard_batch(batch, mesh)

    step = jax.jit(make_train_step(model, tx), donate_argnums=(0, 1))
    key = jax.random.key(2, impl="rbg")   # hardware RNG for dropout (+40%)
    for i in range(WARMUP_STEPS):
        params, opt_state, metrics = step(params, opt_state, db, key)
    # NOTE: on the tunneled axon backend block_until_ready returns before
    # execution finishes; a host fetch is the only reliable fence.
    np.asarray(metrics)

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        params, opt_state, metrics = step(params, opt_state, db, key)
    np.asarray(metrics)
    dt = time.perf_counter() - t0

    qa_pairs_per_sec_per_chip = B * MEASURE_STEPS / dt / n_chips
    print(json.dumps({
        "metric": "train QA-pairs/sec/chip (batch 80, bf16, full CRCT)",
        "value": round(qa_pairs_per_sec_per_chip, 2),
        "unit": "qa_pairs/s/chip",
        "vs_baseline": round(
            qa_pairs_per_sec_per_chip / BASELINE_QA_PAIRS_PER_SEC_PER_GPU, 3),
    }))


if __name__ == "__main__":
    import sys
    main(pallas="--pallas" in sys.argv)
