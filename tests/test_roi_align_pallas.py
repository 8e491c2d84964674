"""Pallas RoIAlign-backward numerics, pinned on CPU via interpret mode.

The kernel (crct_tpu/ops/roi_align_pallas.py) must agree with the
separable-einsum VJP (roi_align._mlra_backward) — the already-pinned
reference for Detectron2 RoIAlign gradient semantics
(Detector/extract_features.py:63) — to fp32 accumulation-order noise,
including pathological chart-box aspect ratios (wide axis-title boxes,
tall thin bars) whose footprints span many 16-row slabs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.ops import roi_align
from crct_tpu.ops.roi_align import _mlra_backward, multilevel_roi_align
from crct_tpu.ops.roi_align_pallas import mlra_backward_pallas

STRIDES = (4, 8, 16, 32)
H, W, C = 80, 104, 64


@pytest.fixture(scope="module")
def feats():
    r = np.random.default_rng(3)
    return tuple(jnp.asarray(r.random((H // s, W // s, C), np.float32))
                 for s in STRIDES)


def _boxes(n, seed=0):
    r = np.random.default_rng(seed)
    raw = np.sort(r.random((n, 2, 2), np.float32), axis=1)
    b = np.concatenate([raw[:, 0] * [W * 4, H * 4],
                        raw[:, 1] * [W * 4, H * 4]], axis=1)
    b[0] = [1, 1, 300, 9]       # wide flat (x-axis title)
    b[1] = [2, 5, 10, 310]      # tall thin (bar)
    b[2] = [0, 0, 2, 2]         # tiny
    return jnp.asarray(b)


def _close(got, want, rtol=2e-5):
    for l, (a, b) in enumerate(zip(got, want)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() <= rtol * scale, \
            f"level {l}: {np.abs(a - b).max():.2e} vs scale {scale:.1f}"


@pytest.mark.parametrize("n,p", [(37, 7), (12, 14), (64, 7)])
def test_matches_einsum_vjp(feats, n, p):
    """Odd N (chunk padding), box P=7 and mask P=14 geometries."""
    boxes = _boxes(n)
    g = jnp.asarray(np.random.default_rng(7).random((n, p, p, C),
                                                    np.float32))
    args = (STRIDES, p, 2, 4, 224, 2, 5)
    _close(mlra_backward_pallas(feats, boxes, g, *args, interpret=True),
           _mlra_backward(feats, boxes, g, *args))


def test_bf16_grad_matches(feats):
    """Train-path cotangent dtype: bf16 grad_pooled, bf16 feature maps."""
    boxes = _boxes(16)
    f16 = tuple(f.astype(jnp.bfloat16) for f in feats)
    g = jnp.asarray(np.random.default_rng(9).random((16, 7, 7, C),
                                                    np.float32)
                    ).astype(jnp.bfloat16)
    args = (STRIDES, 7, 2, 4, 224, 2, 5)
    got = mlra_backward_pallas(f16, boxes, g, *args, interpret=True)
    want = _mlra_backward(f16, boxes, g, *args)
    assert got[0].dtype == jnp.bfloat16
    _close(got, want, rtol=1e-2)


def test_wired_into_custom_vjp(feats, monkeypatch):
    """jax.grad through multilevel_roi_align routes to the Pallas kernel
    when enabled and matches the einsum route."""
    boxes = _boxes(11)

    def loss(f):
        out = multilevel_roi_align(f, boxes, strides=STRIDES, output_size=7)
        return jnp.sum(out * out)

    monkeypatch.setattr(roi_align, "USE_PALLAS_BACKWARD", False)
    want = jax.grad(loss)(feats)
    monkeypatch.setattr(roi_align, "USE_PALLAS_BACKWARD", True)
    import crct_tpu.ops.roi_align_pallas as rap
    orig = rap.mlra_backward_pallas
    calls = {}

    def spy(*a, **k):
        calls["hit"] = True
        return orig(*a, **k, interpret=True)

    monkeypatch.setattr(rap, "mlra_backward_pallas", spy)
    jax.clear_caches()          # the einsum-route trace is cached
    got = jax.grad(loss)(feats)
    assert calls.get("hit"), "Pallas backward was not dispatched"
    _close(got, want)
