"""Per-shape attention path comparison: XLA vs Pallas fused kernels.

VERDICT r3 #3: the train-shape result (batch 80, XLA wins) does not settle
the eval-chunk geometry (480 rows x L124/R44, forward-only) where eval/serve
throughput lives, nor small serving batches. This tool measures the REAL
jitted steps (make_eval_step / make_train_step) on the flagship model at
each shape for both attention paths and prints a win/loss table for
docs/KERNELS.md.

Methodology (docs/ROUND4.md): per-step outputs are small (scores/metrics),
so a dispatch loop with one trailing host fetch is not tunnel-fetch
dominated; >=20 iterations amortize dispatch. Params are initialized ONCE
at a tiny batch (structure is batch-independent and identical for both
attention paths) — only the measured step compiles per shape.

Usage: python tools/attention_shape_bench.py [--steps 20]
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


def bench_eval_shape(model, params, batch, steps: int) -> float:
    from crct_tpu.train.eval_loop import make_eval_step

    rows = {k: v for k, v in batch.items() if k != "next_sentence_labels"}
    step = make_eval_step(model)
    out = step(params, rows)
    np.asarray(out[0])                      # fence (axon: host fetch only)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(params, rows)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / steps


def bench_train_shape(model, params, batch, steps: int) -> float:
    import jax
    from crct_tpu.train.optimizer import make_optimizer
    from crct_tpu.train.train_loop import make_train_step

    params = jax.tree.map(lambda x: x.copy(), params)   # step donates them
    hp = dict(lr=2e-5, image_lr=2e-5, min_lr=1.3e-5, warmup=3000, wd=0.01)
    tx = make_optimizer(hp, params, iters_per_epoch=1000)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0, 1))
    key = jax.random.key(2, impl="rbg")
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, batch, key)
    np.asarray(metrics)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, metrics = step(params, opt_state, batch, key)
    np.asarray(metrics)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--shapes", default="")
    args = ap.parse_args()

    import jax
    from __graft_entry__ import _synthetic_step_batch
    from crct_tpu.config import CRCTModelConfig
    from crct_tpu.models.crct import CRCTModel

    rng = np.random.default_rng(0)
    # one tiny init; param structure is identical for both attention paths
    init_batch = _synthetic_step_batch(rng, B=8, L=124, R=44, vdim=1024,
                                       vocab=30522, cats=228)
    base_cfg = CRCTModelConfig(dtype="bfloat16")
    base_model = CRCTModel(config=base_cfg, categories=228)
    params = jax.jit(functools.partial(base_model.init, train=False))(
        {"params": jax.random.key(0)}, init_batch)["params"]
    print("[init done]", flush=True)

    shapes = [
        ("eval_chunk_480", "eval", 480),   # resolve_eval_chunk default/serve
        ("eval_b120", "eval", 120),        # one 120-fanout question
        ("serve_b8", "eval", 8),           # small interactive serving batch
        ("train_b80", "train", 80),        # reference train batch
    ]
    if args.shapes:
        keep = set(args.shapes.split(","))
        shapes = [s for s in shapes if s[0] in keep]
    results = {}
    for name, kind, B in shapes:
        results[name] = {}
        batch = _synthetic_step_batch(rng, B=B, L=124, R=44, vdim=1024,
                                      vocab=30522, cats=228)
        for pallas in (False, True):
            cfg = CRCTModelConfig(dtype="bfloat16",
                                  use_pallas_attention=pallas)
            model = CRCTModel(config=cfg, categories=228)
            fn = bench_eval_shape if kind == "eval" else bench_train_shape
            sec = fn(model, params, batch, args.steps)
            path = "pallas" if pallas else "xla"
            results[name][path] = round(B / sec, 1)
            print(f"{name:16s} {path:6s} {B/sec:9.1f} rows/s "
                  f"({sec*1e3:7.2f} ms/step)", flush=True)
        xla, pl = results[name]["xla"], results[name]["pallas"]
        results[name]["pallas_over_xla"] = round(pl / xla, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
