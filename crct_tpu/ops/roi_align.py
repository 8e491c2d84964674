"""RoIAlign as pure XLA gathers + bilinear interpolation.

TPU-native replacement for Detectron2's CUDA RoIAlign (`box_pooler`,
reference Detector/extract_features.py:63): for each box, a fixed
``output_size x output_size`` grid of bins is sampled at ``sampling_ratio^2``
bilinear points and averaged. Shapes are fully static — N boxes in, N pooled
features out, invalid boxes masked by the caller — so the op batches onto
the VPU/MXU with no dynamic control flow.

Implements the "aligned" convention (half-pixel offset), matching
Detectron2's ROIAlignV2 used by its default box pooler.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample feat [H, W, C] at fractional (y, x) points of shape [...]."""
    H, W, C = feat.shape
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy1 = y - y0.astype(y.dtype)
    wx1 = x - x0.astype(x.dtype)
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def g(yy, xx):
        return feat[yy, xx]  # advanced indexing -> gather, [...], C

    out = (g(y0, x0) * (wy0 * wx0)[..., None]
           + g(y0, x1) * (wy0 * wx1)[..., None]
           + g(y1, x0) * (wy1 * wx0)[..., None]
           + g(y1, x1) * (wy1 * wx1)[..., None])
    return out


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, *,
              spatial_scale: float = 1.0, output_size: int = 7,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign over one feature map.

    Args:
      features: [H, W, C] feature map.
      boxes: [N, 4] (x1, y1, x2, y2) in image coordinates.
      spatial_scale: feature-map stride reciprocal (e.g. 1/16).
      output_size: pooled grid P (P x P bins).
      sampling_ratio: bilinear samples per bin side.

    Returns: [N, P, P, C] pooled features.
    """
    P, S = output_size, sampling_ratio
    boxes = boxes.astype(jnp.float32) * spatial_scale
    # aligned=True: half-pixel offset
    x1 = boxes[:, 0] - 0.5
    y1 = boxes[:, 1] - 0.5
    x2 = boxes[:, 2] - 0.5
    y2 = boxes[:, 3] - 0.5
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)
    bin_w = roi_w / P
    bin_h = roi_h / P

    # sample offsets within a bin: (s + 0.5) / S for s in [0, S)
    offs = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S        # [S]
    grid = jnp.arange(P, dtype=jnp.float32)                    # [P]
    # per-box sample coordinates: [N, P, S]
    ys = (y1[:, None, None]
          + (grid[None, :, None] + offs[None, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None]
          + (grid[None, :, None] + offs[None, None, :]) * bin_w[:, None, None])

    # full grids [N, P*S, P*S]
    ys_full = jnp.broadcast_to(ys.reshape(-1, P * S, 1),
                               (ys.shape[0], P * S, P * S))
    xs_full = jnp.broadcast_to(xs.reshape(-1, 1, P * S),
                               (xs.shape[0], P * S, P * S))
    sampled = _bilinear_sample(features, ys_full, xs_full)     # [N,PS,PS,C]
    N, _, _, C = sampled.shape
    pooled = sampled.reshape(N, P, S, P, S, C).mean(axis=(2, 4))
    return pooled


def _mlra_geometry(features, boxes, strides, output_size, sampling_ratio,
                   canonical_level, canonical_size, min_level, max_level):
    """Per-box level assignment + separable 1-D bilinear sample positions.

    The sample grid is separable: row coordinate depends only on the row
    index, column only on the column index. Returns per-axis integer corner
    indices and weights of shape [N, P*S] plus the level data."""
    import numpy as np

    boxes = boxes.astype(jnp.float32)
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    scale = jnp.sqrt(w * h)
    lvl = jnp.floor(canonical_level
                    + jnp.log2(jnp.maximum(scale, 1e-6) / canonical_size))
    lvl = (jnp.clip(lvl, min_level, max_level).astype(jnp.int32)
           - min_level)                                           # [N] 0..L-1

    Hs = np.asarray([f.shape[0] for f in features])
    Ws = np.asarray([f.shape[1] for f in features])
    level_offset = np.concatenate([[0], np.cumsum(Hs * Ws)])[:-1]

    box_H = jnp.asarray(Hs, jnp.float32)[lvl]                     # [N]
    box_W = jnp.asarray(Ws, jnp.float32)[lvl]
    box_off = jnp.asarray(level_offset, jnp.int32)[lvl]
    inv_stride = (1.0 / jnp.asarray(strides, jnp.float32))[lvl]

    P, S = output_size, sampling_ratio
    b = boxes * inv_stride[:, None]
    # aligned=True: half-pixel offset (Detectron2 ROIAlignV2)
    x1 = b[:, 0] - 0.5
    y1 = b[:, 1] - 0.5
    bin_w = jnp.maximum(b[:, 2] - 0.5 - x1, 1e-6) / P
    bin_h = jnp.maximum(b[:, 3] - 0.5 - y1, 1e-6) / P

    offs = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S           # [S]
    grid = jnp.arange(P, dtype=jnp.float32)                       # [P]
    ys = (y1[:, None, None]
          + (grid[None, :, None] + offs[None, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None]
          + (grid[None, :, None] + offs[None, None, :]) * bin_w[:, None, None])
    N = boxes.shape[0]
    ys = ys.reshape(N, P * S)
    xs = xs.reshape(N, P * S)

    def corners(v, limit):
        v = jnp.clip(v, 0.0, limit[:, None])
        lo = jnp.floor(v).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, limit[:, None].astype(jnp.int32))
        w_hi = v - lo.astype(v.dtype)
        return lo, hi, 1.0 - w_hi, w_hi

    y0, y1i, wy0, wy1 = corners(ys, box_H - 1.0)
    x0, x1i, wx0, wx1 = corners(xs, box_W - 1.0)
    return dict(lvl=lvl, Hs=Hs, Ws=Ws, box_off=box_off, box_W=box_W,
                y0=y0, y1i=y1i, wy0=wy0, wy1=wy1,
                x0=x0, x1i=x1i, wx0=wx0, wx1=wx1)


def _mlra_forward(features, boxes, strides, output_size, sampling_ratio,
                  canonical_level, canonical_size, min_level, max_level):
    geo = _mlra_geometry(features, boxes, strides, output_size,
                         sampling_ratio, canonical_level, canonical_size,
                         min_level, max_level)
    C = features[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)
    N = boxes.shape[0]
    P, S = output_size, sampling_ratio

    base = geo["box_off"][:, None, None]
    Wi = geo["box_W"].astype(jnp.int32)[:, None, None]
    y0 = geo["y0"][:, :, None]
    y1i = geo["y1i"][:, :, None]
    x0 = geo["x0"][:, None, :]
    x1i = geo["x1i"][:, None, :]
    wy0 = geo["wy0"][:, :, None]
    wy1 = geo["wy1"][:, :, None]
    wx0 = geo["wx0"][:, None, :]
    wx1 = geo["wx1"][:, None, :]

    def g(yy, xx):
        return flat[base + yy * Wi + xx]          # gather -> [N,PS,PS,C]

    sampled = (g(y0, x0) * (wy0 * wx0)[..., None]
               + g(y0, x1i) * (wy0 * wx1)[..., None]
               + g(y1i, x0) * (wy1 * wx0)[..., None]
               + g(y1i, x1i) * (wy1 * wx1)[..., None])
    return sampled.reshape(N, P, S, P, S, C).mean(axis=(2, 4))


_BWD_INTERMEDIATE_BUDGET_BYTES = 384e6

# Backward implementation. The Pallas slab-scatter kernel
# (ops/roi_align_pallas.py) does O(N * W * P * C) work against the
# einsums' O(N * H * W * P * C) and wins at the op level (2.05 vs
# 2.75 ms/grad, 800px/512 rois, v5e) — but LOSES inside the full 800px
# train step (86.8 vs 82.1 ms/step measured): the shared XLA-side
# geometry precompute no longer amortizes and per-level kernel launches
# beat the saving. Einsum stays the default; the kernel is the tested
# opt-in for larger maps, where the einsums' O(H) waste grows
# (see docs/KERNELS.md).
USE_PALLAS_BACKWARD = False


def _pallas_backward_enabled() -> bool:
    return bool(USE_PALLAS_BACKWARD)


def _mlra_backward(features, boxes, grad_pooled, strides, output_size,
                   sampling_ratio, canonical_level, canonical_size,
                   min_level, max_level):
    """Gradient w.r.t. the feature maps WITHOUT scatter: the bilinear
    weights are separable, so per level

        grad_feat[y, x, c] = sum_n,p,q Wy[n,p,y] Wx[n,q,x] g[n,p,q,c]

    is two dense einsums (MXU work) per pyramid level — measured far
    faster than XLA's scatter-add transpose of the gather on TPU.

    The S x S sample mean is folded INTO the per-axis bin weight matrices
    (Wy[n,p,y] = (1/S) * sum_s of the two bilinear row weights of sample
    (p, s)), so the einsums run at bin granularity P instead of sample
    granularity P*S — half the FLOPs and half the [N, H, P, C]
    intermediate of the per-sample formulation. Each level is computed in
    ONE einsum pair over all rois whenever the intermediate fits the
    memory budget; only above it does a lax.scan chunk the roi axis (the
    old fixed chunk-of-16 paid a full-map accumulator read-modify-write
    per chunk, which dominated the backward at 800px shapes)."""
    geo = _mlra_geometry(features, boxes, strides, output_size,
                         sampling_ratio, canonical_level, canonical_size,
                         min_level, max_level)
    N = boxes.shape[0]
    P, S = output_size, sampling_ratio
    C = features[0].shape[-1]
    g = grad_pooled.astype(jnp.float32)                    # [N, P, P, C]

    def bin_weights(lo, hi, w_lo, w_hi, L):
        """Fold bilinear corner weights + the 1/S sample mean into a dense
        [N, P, L] per-axis weight matrix (lo/hi/w_*: [N, P*S])."""
        iota = jnp.arange(L, dtype=jnp.int32)
        lo = lo.reshape(N, P, S)
        hi = hi.reshape(N, P, S)
        w_lo = w_lo.reshape(N, P, S)
        w_hi = w_hi.reshape(N, P, S)
        W = ((w_lo[..., None] * (lo[..., None] == iota)).sum(2)
             + (w_hi[..., None] * (hi[..., None] == iota)).sum(2))
        return W / float(S)

    grads = []
    for l, feat in enumerate(features):
        H, W = feat.shape[0], feat.shape[1]
        on_l = (geo["lvl"] == l).astype(jnp.float32)       # [N]
        Wy = bin_weights(geo["y0"], geo["y1i"], geo["wy0"], geo["wy1"], H)
        Wx = bin_weights(geo["x0"], geo["x1i"], geo["wx0"], geo["wx1"], W)
        Wy = Wy * on_l[:, None, None]

        # chunk the roi axis only when the [CH, H, P, C] intermediate
        # would blow the budget (scales with image area)
        per_roi = H * P * C * 4
        CH = int(min(N, max(1, _BWD_INTERMEDIATE_BUDGET_BYTES // per_roi)))
        if CH >= N:
            t = jnp.einsum("npy,npqc->nyqc", Wy, g)
            acc = jnp.einsum("nqx,nyqc->yxc", Wx, t)
        else:
            G = -(-N // CH)
            pad = G * CH - N

            def chunked(x):
                if pad:
                    x = jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
                return x.reshape((G, CH) + x.shape[1:])

            def body(acc, xs):
                wy_c, wx_c, g_c = xs
                t = jnp.einsum("kpy,kpqc->kyqc", wy_c, g_c)
                return acc + jnp.einsum("kqx,kyqc->yxc", wx_c, t), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((H, W, C), g.dtype),
                (chunked(Wy), chunked(Wx), chunked(g)))
        # cotangent dtype must match the primal feature map (e.g. bf16
        # FPN maps with a float32 grad_pooled would fail the VJP check)
        grads.append(acc.astype(feat.dtype))
    return tuple(grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _mlra(features, boxes, strides, output_size, sampling_ratio,
          canonical_level, canonical_size, min_level, max_level):
    return _mlra_forward(features, boxes, strides, output_size,
                         sampling_ratio, canonical_level, canonical_size,
                         min_level, max_level)


def _mlra_fwd(features, boxes, strides, output_size, sampling_ratio,
              canonical_level, canonical_size, min_level, max_level):
    out = _mlra_forward(features, boxes, strides, output_size,
                        sampling_ratio, canonical_level, canonical_size,
                        min_level, max_level)
    return out, (features, boxes)


def _mlra_bwd(strides, output_size, sampling_ratio, canonical_level,
              canonical_size, min_level, max_level, res, grad_pooled):
    features, boxes = res
    if _pallas_backward_enabled():
        from crct_tpu.ops.roi_align_pallas import mlra_backward_pallas
        grad_feats = mlra_backward_pallas(
            features, boxes, grad_pooled, strides, output_size,
            sampling_ratio, canonical_level, canonical_size, min_level,
            max_level)
    else:
        grad_feats = _mlra_backward(features, boxes, grad_pooled, strides,
                                    output_size, sampling_ratio,
                                    canonical_level, canonical_size,
                                    min_level, max_level)
    # no gradient to the box coordinates (Detectron2 RoIAlign semantics;
    # the train path stop-gradients proposals anyway)
    return tuple(grad_feats), jnp.zeros_like(boxes)


_mlra.defvjp(_mlra_fwd, _mlra_bwd)


@functools.partial(jax.jit,
                   static_argnames=("strides", "output_size",
                                    "sampling_ratio", "canonical_level",
                                    "canonical_size", "min_level",
                                    "max_level"))
def multilevel_roi_align(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         *, strides: Tuple[int, ...] = (4, 8, 16, 32),
                         output_size: int = 7, sampling_ratio: int = 2,
                         canonical_level: int = 4, canonical_size: int = 224,
                         min_level: int = 2, max_level: int = 5) -> jnp.ndarray:
    """FPN RoIAlign: assign each box to a pyramid level by scale (FPN eq. 1),
    then bilinear-sample from ONE flattened pyramid tensor.

    All levels' maps are flattened row-major and concatenated to [sum(HW), C];
    each sample point becomes one flat row index (level offset + y*W + x), so
    every box is pooled exactly once at its assigned level — 1/L the gather
    traffic of pooling every box at every level and selecting. The backward
    pass is a custom VJP built from dense separable einsums instead of
    XLA's scatter-add (see _mlra_backward); box-coordinate gradients are
    not propagated, matching Detectron2's RoIAlign.

    features: list of [H_l, W_l, C] maps for levels min_level..max_level.
    """
    return _mlra(tuple(features), boxes, tuple(strides), output_size,
                 sampling_ratio, canonical_level, canonical_size,
                 min_level, max_level)
