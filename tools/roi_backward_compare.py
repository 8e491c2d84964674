"""Measure the RoIAlign backward: custom einsum VJP vs XLA scatter-add.

Times grad-of-sum through ``multilevel_roi_align`` (custom separable-einsum
VJP, crct_tpu/ops/roi_align.py::_mlra_backward) against autodiff through the
raw forward (``_mlra_forward`` — XLA transposes the gather into a
scatter-add) at the production 800px-shortest-edge FPN shapes
(canvas 800x1088: P2 200x272 .. P5 25x34, 256 channels, 512 rois).

Run on the TPU:  python tools/roi_backward_compare.py [--rois N]
Numbers land in docs/BENCHMARKS.md (detector section).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from crct_tpu.ops.roi_align import _mlra_forward, multilevel_roi_align

    n_rois = 512
    if "--rois" in sys.argv:
        n_rois = int(sys.argv[sys.argv.index("--rois") + 1])
    H, W = 800, 1088
    strides = (4, 8, 16, 32)
    rng = np.random.default_rng(0)
    feats = tuple(
        jnp.asarray(rng.random((H // s, W // s, 256)).astype(np.float32))
        for s in strides)
    raw = np.sort(rng.random((n_rois, 2, 2)).astype(np.float32), axis=1)
    boxes = jnp.asarray(np.concatenate(
        [raw[:, 0] * [W, H], raw[:, 1] * [W, H]], axis=1))

    def run(tag, fn):
        g = jax.jit(jax.grad(
            lambda f: jnp.sum(fn(f, boxes)), argnums=0))
        out = g(feats)
        np.asarray(out[0])              # axon fence: host fetch only
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = g(feats)
        np.asarray(out[0])
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{tag}: {ms:.2f} ms/grad ({n_rois} rois, 800x1088 FPN)")
        return ms

    custom = run("custom einsum VJP ", lambda f, b: multilevel_roi_align(
        f, b, strides=strides, output_size=7))
    scatter = run("XLA scatter-add   ", lambda f, b: _mlra_forward(
        f, b, strides, 7, 2, 4, 224, 2, 5))
    print(f"speedup (scatter/einsum): {scatter / custom:.2f}x")


if __name__ == "__main__":
    main()
