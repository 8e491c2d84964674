"""Measure the RoIAlign backward: Pallas slab-scatter vs einsum VJP vs
XLA scatter-add.

Times grad-of-sum through ``multilevel_roi_align`` (custom VJP —
Pallas kernel `ops/roi_align_pallas.py` or separable-einsum
`ops/roi_align.py::_mlra_backward`) against autodiff through the raw
forward (``_mlra_forward`` — XLA transposes the gather into a
scatter-add) at the production 800px-shortest-edge FPN shapes
(canvas 800x1088: P2 200x272 .. P5 25x34, 256 channels, 512 rois).

Methodology note: on the tunneled axon backend a naive
dispatch-loop-then-fetch timing is dominated by the final host fetch of
the [200,272,256] P2 gradient (~55 MB through the tunnel — this is what
made round-3's "58 ms/grad" ~20x too big). Device time is isolated by
running the grad inside a ``lax.scan`` whose per-step cotangent differs
(data dependency on the carry) and fetching ONE scalar.

Run on the TPU:  python tools/roi_backward_compare.py [--rois N]
Numbers land in docs/BENCHMARKS.md (detector section) / docs/KERNELS.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 20


def main():
    import jax
    import jax.numpy as jnp

    import crct_tpu.ops.roi_align as ra
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
        @jax.jit
        def scan_grads(feats):
            def body(carry, i):
                # scale makes each step's cotangent distinct so nothing
                # is CSE'd or cached across iterations
                scale = 1.0 + carry * 1e-12 + i * 1e-9
                g = jax.grad(lambda f: jnp.sum(fn(f, boxes)) * scale)(feats)
                return carry + g[0][0, 0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0.),
                                jnp.arange(STEPS, dtype=jnp.float32))
            return c

        float(scan_grads(feats))                      # compile
        best = min(_t(scan_grads, feats) for _ in range(2))
        ms = best / STEPS * 1000
        print(f"{tag}: {ms:.2f} ms/grad ({n_rois} rois, 800x1088 FPN)")
        return ms

    def _t(f, *a):
        t0 = time.perf_counter()
        float(f(*a))
        return time.perf_counter() - t0

    ra.USE_PALLAS_BACKWARD = True
    pallas = run("Pallas slab-scatter", lambda f, b: multilevel_roi_align(
        f, b, strides=strides, output_size=7))
    ra.USE_PALLAS_BACKWARD = False
    jax.clear_caches()
    custom = run("custom einsum VJP  ", lambda f, b: multilevel_roi_align(
        f, b, strides=strides, output_size=7))
    scatter = run("XLA scatter-add    ", lambda f, b: _mlra_forward(
        f, b, strides, 7, 2, 4, 224, 2, 5))
    ra.USE_PALLAS_BACKWARD = None
    print(f"speedups: scatter/einsum {scatter / custom:.2f}x, "
          f"einsum/pallas {custom / pallas:.2f}x")


if __name__ == "__main__":
    main()
