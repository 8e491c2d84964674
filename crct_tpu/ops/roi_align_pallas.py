"""Pallas TPU kernel for the multilevel-RoIAlign backward pass.

TPU-native replacement for the gradient of Detectron2's CUDA RoIAlign
(`box_pooler`, reference Detector/extract_features.py:63) — the CUDA op
scatter-adds per sample with atomics; XLA's transpose of the gather is a
serialized scatter, and a dense separable-einsum formulation pays
O(N * H * W * P * C) MXU FLOPs because the per-roi row/column weight
matrices are materialized over the FULL map axes even though each roi
touches a tiny window.

Measured (v5e, 800px/512 rois, grad-in-lax.scan methodology — see
tools/roi_backward_compare.py): this kernel 2.05 ms/grad vs the einsum
VJP's 2.75 — an op-level win, but a full-train-step LOSS (86.8 vs
82.1 ms/step) because the XLA-side geometry precompute stops amortizing
and per-level kernel launches outweigh the 0.7 ms. It ships as the
tested opt-in (`roi_align.USE_PALLAS_BACKWARD = True`) for larger maps,
where the einsums' O(H) waste grows.

This kernel keeps the O(N * W * P * C) work but never the O(H) waste:

  * the map gradient is built slab by slab — a [SLAB, W, C] accumulator
    stays resident in VMEM across roi chunks (grid = (slabs, roi chunks),
    output block constant along the chunk axis);
  * per roi, the column dimension is densified ONCE into
    U[x, p, c] = sum_q Wx[q, x] * g[p, q, c]  — one small MXU contraction
    per roi (K = P bins), where Wx is the per-roi bin->column bilinear
    weight matrix with the 1/S sample-mean fold (same construction as the
    einsum VJP's bin_weights);
  * the row dimension stays SPARSE: each of the P*S sample rows
    contributes yw * U[:, p, :] to exactly two map rows (bilinear corner
    pair), applied as predicated dynamic-row adds into the slab
    accumulator — VPU work proportional to the rois actually present, not
    to H;
  * rois are skipped wholesale when their y-extent misses the slab (or
    they live on another pyramid level), via scalar min/max rows in SMEM.

Boxes receive no gradient (Detectron2 RoIAlign semantics — the train path
stop-gradients proposals).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFF = np.int32(2 ** 30)          # ymin sentinel: roi intersects no slab


def _roi_chunk(P: int) -> int:
    """Rois per grid step, sized so the g block + U scratch fit VMEM
    alongside the slab accumulator (P=14 quadruples the g block)."""
    return 32 if P <= 8 else 8


def _bwd_kernel(ylo_ref, yhi_ref, ywlo_ref, ywhi_ref, ymin_ref, ymax_ref,
                g_ref, wx_ref, out_ref, u_ref, *, slab: int, P: int, S: int):
    i = pl.program_id(0)                                   # slab index
    j = pl.program_id(1)                                   # roi chunk

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    slab_start = i * slab
    RB = g_ref.shape[0]

    def roi_body(r, _):
        hit = ((ymax_ref[r, 0] >= slab_start)
               & (ymin_ref[r, 0] < slab_start + slab))

        @pl.when(hit)
        def _():
            # U[p, x, c] = sum_q Wx[q, x] g[p, q, c] — bin->column
            # densification; one small MXU pass per bin row keeps each
            # U[p] slice contiguous [W, C] for the row adds below
            for p in range(P):
                u_ref[p] = jax.lax.dot_general(
                    wx_ref[r], g_ref[r, p].astype(jnp.float32),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            # each sample row scatters into its two bilinear corner rows
            for s in range(P * S):
                p = s // S
                for yref, wref in ((ylo_ref, ywlo_ref), (yhi_ref, ywhi_ref)):
                    ry = yref[r, s] - slab_start

                    @pl.when((ry >= 0) & (ry < slab))
                    def _(ry=ry, yref=yref, wref=wref, s=s, p=p):
                        row = out_ref[pl.ds(ry, 1)]
                        out_ref[pl.ds(ry, 1)] = (
                            row + wref[r, s] * u_ref[p][None])
        return None

    jax.lax.fori_loop(0, RB, roi_body, None)


def _level_backward(g, wx, ylo, yhi, ywlo, ywhi, ymin, ymax, H, W, C,
                    slab, interpret):
    """One pyramid level: returns the [H, W, C] fp32 map gradient."""
    N, P = g.shape[0], g.shape[1]
    S = ylo.shape[1] // P
    RB = _roi_chunk(P)
    pad = (-N) % RB
    if pad:
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        g, wx, ylo, yhi, ywlo, ywhi = map(zf, (g, wx, ylo, yhi, ywlo, ywhi))
        ymin = jnp.concatenate([ymin, jnp.full((pad,), _OFF)])
        ymax = jnp.concatenate([ymax, jnp.full((pad,), -1, ymax.dtype)])
    # rank-1 SMEM blocks must be 128-aligned; keep the scalars 2-D instead
    ymin = ymin[:, None]
    ymax = ymax[:, None]
    n_chunks = (N + pad) // RB
    n_slabs = pl.cdiv(H, slab)

    smem = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (j,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.SMEM)
    in_specs = [
            smem((RB, P * S)), smem((RB, P * S)),          # ylo, yhi
            smem((RB, P * S)), smem((RB, P * S)),          # ywlo, ywhi
            smem((RB, 1)), smem((RB, 1)),                  # ymin, ymax
            pl.BlockSpec((RB, P, P, C), lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),         # g
            pl.BlockSpec((RB, P, W), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),         # wx
    ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, slab=slab, P=P, S=S),
        grid=(n_slabs, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((slab, W, C), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_slabs * slab, W, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P, W, C), jnp.float32)],
        interpret=interpret,
    )(ylo, yhi, ywlo, ywhi, ymin, ymax, g, wx)[:H]


def mlra_backward_pallas(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         grad_pooled: jnp.ndarray, strides: Tuple[int, ...],
                         output_size: int, sampling_ratio: int,
                         canonical_level: int, canonical_size: int,
                         min_level: int, max_level: int, *,
                         slab: int = 16, interpret: bool = False):
    """Drop-in replacement for roi_align._mlra_backward (feature grads)."""
    from crct_tpu.ops.roi_align import _mlra_geometry

    geo = _mlra_geometry(features, boxes, strides, output_size,
                         sampling_ratio, canonical_level, canonical_size,
                         min_level, max_level)
    N = boxes.shape[0]
    P, S = output_size, sampling_ratio
    C = features[0].shape[-1]
    g = grad_pooled.astype(jnp.float32)                    # [N, P, P, C]

    def bin_weights(lo, hi, w_lo, w_hi, L):
        """[N, P, L] bin->axis weights with the 1/S sample-mean fold —
        identical math to the einsum VJP's bin_weights."""
        iota = jnp.arange(L, dtype=jnp.int32)
        lo = lo.reshape(N, P, S)
        hi = hi.reshape(N, P, S)
        w_lo = w_lo.reshape(N, P, S)
        w_hi = w_hi.reshape(N, P, S)
        W = ((w_lo[..., None] * (lo[..., None] == iota)).sum(2)
             + (w_hi[..., None] * (hi[..., None] == iota)).sum(2))
        return W / float(S)

    inv_S = 1.0 / float(S)
    grads = []
    for l, feat in enumerate(features):
        H, W = feat.shape[0], feat.shape[1]
        on_l = geo["lvl"] == l
        wx = bin_weights(geo["x0"], geo["x1i"], geo["wx0"], geo["wx1"], W)
        # y stays sample-sparse; fold the remaining 1/S here
        ywlo = geo["wy0"] * inv_S
        ywhi = geo["wy1"] * inv_S
        # off-level rois are skipped wholesale via an impossible y-range
        ymin = jnp.where(on_l, geo["y0"].min(axis=1), _OFF)
        ymax = jnp.where(on_l, geo["y1i"].max(axis=1), -1)
        acc = _level_backward(g, wx, geo["y0"], geo["y1i"], ywlo, ywhi,
                              ymin, ymax, H, W, C, min(slab, H), interpret)
        grads.append(acc.astype(feat.dtype))
    return tuple(grads)
