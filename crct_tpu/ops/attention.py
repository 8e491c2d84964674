"""Fused multi-head attention as a Pallas TPU kernel.

The CRCT sequence lengths are tiny (124 text / 44 vision tokens;
CRCT/config/plotqa.json), so a whole (L_q, L_k) attention tile fits in VMEM
per (batch, head) program: one kernel computes QK^T, adds the additive mask,
does a numerically-stable softmax and the PV matmul without ever writing the
probability matrix to HBM. This replaces the reference's unfused
matmul-softmax-matmul chain (CRCT/backbone/vilbert.py:396-409) whose
intermediates are HBM traffic on GPU.

Falls back to plain jnp on non-TPU backends (tests run on CPU).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    """One program per batch item; all heads batched on the MXU."""
    q = q_ref[0].astype(jnp.float32)            # [H, Lq, D]
    k = k_ref[0].astype(jnp.float32)            # [H, Lk, D]
    v = v_ref[0].astype(jnp.float32)            # [H, Lk, D]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale     # [H, Lq, Lk]
    scores = scores + mask_ref[0]                # additive [1, 1|Lq, Lk]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def _fused_attention_tpu(q, k, v, additive_mask):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    # mask broadcast to [B, 1, Lq|1, Lk] (incoming [B,1,1,Lk] or [B,1,Lq,Lk])
    mask = jnp.broadcast_to(additive_mask, (B, 1, additive_mask.shape[2], Lk))
    Lm = mask.shape[2]
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / math.sqrt(D)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Lq, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lk, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lm, Lk), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Lq, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v, mask)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    additive_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Attention core [B,H,L,D] with additive mask; Pallas on TPU, jnp else."""
    if additive_mask is None:
        additive_mask = jnp.zeros((q.shape[0], 1, 1, k.shape[2]), q.dtype)
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(q.shape[-1]) + additive_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return _fused_attention_tpu(q, k, v, additive_mask)
