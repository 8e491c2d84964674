"""One-off TPU measurement of opt-in training-recipe variants.

Times the same flagship train step as bench.py's headline (batch 80/chip,
bf16 activations, PlotQA shapes) under:

    --opt-bf16-m   bf16 AdamW first moments (-opt_bf16_m)
    --dropout0     all dropout probs 0 (a model-config change the user can
                   make in vilbert.json; NOT the reference recipe)

Run each variant in a FRESH process: the remote AOT compile is not cached
across processes, and a second full-step executable compiled late in one
process can page instead of running at speed (HBM fragmentation — see the
memory notes in docs/BENCHMARKS.md).

    python tools/opt_variant_bench.py [--opt-bf16-m] [--dropout0]

Prints one JSON line with step_ms / qa_pairs_per_sec_per_chip / analytic
MFU for the variant.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--opt-bf16-m", action="store_true")
    p.add_argument("--dropout0", action="store_true")
    args = p.parse_args()

    import functools

    import jax
    from __graft_entry__ import _synthetic_step_batch
    from bench import (BATCH_PER_CHIP, MEASURE_STEPS, V5E_PEAK_BF16_TFLOPS,
                       WARMUP_STEPS, analytic_train_flops)
    from crct_tpu.config import CRCTModelConfig
    from crct_tpu.models.crct import CRCTModel
    from crct_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from crct_tpu.train.optimizer import make_optimizer
    from crct_tpu.train.train_loop import make_train_step

    n_chips = len(jax.devices())
    mesh = make_mesh()
    cfg_kw = dict(dtype="bfloat16")
    if args.dropout0:
        cfg_kw.update(hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0,
                      v_hidden_dropout_prob=0.0,
                      v_attention_probs_dropout_prob=0.0)
    cfg = CRCTModelConfig(**cfg_kw)
    model = CRCTModel(config=cfg, categories=228)
    rng = np.random.default_rng(0)
    B = BATCH_PER_CHIP * n_chips
    batch = _synthetic_step_batch(rng, B=B, L=124, R=44,
                                  vdim=cfg.v_feature_size,
                                  vocab=cfg.vocab_size, cats=228)
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch)
    params_dict = dict(lr=2e-5, image_lr=2e-5, min_lr=1.3e-5, warmup=3000,
                       wd=0.01, opt_bf16_m=args.opt_bf16_m)
    tx = make_optimizer(params_dict, variables["params"], iters_per_epoch=1000)
    params = replicate(variables["params"], mesh)
    opt_state = replicate(tx.init(variables["params"]), mesh)
    db = shard_batch(batch, mesh)

    step = jax.jit(make_train_step(model, tx), donate_argnums=(0, 1))
    key = jax.random.key(2, impl="rbg")
    for _ in range(WARMUP_STEPS):
        params, opt_state, metrics = step(params, opt_state, db, key)
    np.asarray(metrics)          # host fetch = the only reliable fence

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        params, opt_state, metrics = step(params, opt_state, db, key)
    np.asarray(metrics)
    dt = time.perf_counter() - t0

    qps = B * MEASURE_STEPS / dt / n_chips
    a_flops = analytic_train_flops(B=BATCH_PER_CHIP)
    print(json.dumps({
        "variant": {"opt_bf16_m": args.opt_bf16_m,
                    "dropout0": args.dropout0},
        "train_step_ms": round(B / qps / n_chips * 1000, 1),
        "qa_pairs_per_sec_per_chip": round(qps, 1),
        "mfu_pct_v5e_bf16_analytic": round(
            100.0 * a_flops * (qps / BATCH_PER_CHIP) / 1e12
            / V5E_PEAK_BF16_TFLOPS, 1),
    }))


if __name__ == "__main__":
    main()
