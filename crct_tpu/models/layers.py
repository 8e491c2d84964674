"""Building blocks: attention cores, transformer layers, bi-attention.

TPU-first equivalents of the reference's BERT blocks
(CRCT/backbone/vilbert.py:361-788). Attention is a batched einsum that XLA
maps straight onto the MXU; an optional fused Pallas kernel
(crct_tpu.ops.attention) handles the softmax pipeline in VMEM. All masks are
additive (0 / -10000), precomputed once per batch, matching the reference's
extended-mask convention (vilbert.py:1380-1396).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

MASK_VALUE = -10000.0

# reference init: truncated normal std 0.02 for every Linear/Embedding
# (init_bert_weights, vilbert.py:1099-1110); biases zero, LayerNorm (1, 0)
BERT_INIT = nn.initializers.truncated_normal(stddev=0.02)


def dense(features, dtype, name):
    return nn.Dense(features, dtype=dtype, kernel_init=BERT_INIT, name=name)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf GELU (reference vilbert.py:111-117)."""
    return jax.nn.gelu(x, approximate=False)


ACT2FN: dict = {"gelu": gelu, "relu": nn.relu, "swish": nn.swish}


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          additive_mask: Optional[jnp.ndarray],
                          *, dropout_rate: float, deterministic: bool,
                          dropout_rng: Optional[jax.Array] = None,
                          use_pallas: bool = False) -> jnp.ndarray:
    """Multi-head attention core. q,k,v: [B, H, Lq|Lk, Dh].

    additive_mask broadcasts to [B, H, Lq, Lk] (0 attend / -10000 masked).
    """
    if use_pallas:
        from crct_tpu.ops.attention import fused_attention
        rate = 0.0 if deterministic else dropout_rate
        return fused_attention(q, k, v, additive_mask,
                               dropout_rate=rate, dropout_rng=dropout_rng)
    depth = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(depth)
    if additive_mask is not None:
        scores = scores + additive_mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


class SelfAttention(nn.Module):
    """QKV self-attention + output projection + LN residual
    (reference BertAttention, vilbert.py:361-440)."""
    hidden_size: int
    num_heads: int
    attn_dropout: float
    hidden_dropout: float
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, additive_mask, deterministic: bool = True):
        q = dense(self.hidden_size, self.dtype, "query")(x)
        k = dense(self.hidden_size, self.dtype, "key")(x)
        v = dense(self.hidden_size, self.dtype, "value")(x)
        rng = (self.make_rng("dropout")
               if (not deterministic and self.attn_dropout > 0) else None)
        ctx = dot_product_attention(
            split_heads(q, self.num_heads), split_heads(k, self.num_heads),
            split_heads(v, self.num_heads), additive_mask,
            dropout_rate=self.attn_dropout, deterministic=deterministic,
            dropout_rng=rng, use_pallas=self.use_pallas)
        ctx = merge_heads(ctx)
        out = dense(self.hidden_size, self.dtype, "out")(ctx)
        out = nn.Dropout(self.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="out_ln")(out + x)


class FeedForward(nn.Module):
    """Intermediate GELU FFN + output LN residual
    (reference BertIntermediate/BertOutput, vilbert.py:443-471)."""
    hidden_size: int
    intermediate_size: int
    hidden_act: str
    hidden_dropout: float
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = dense(self.intermediate_size, self.dtype, "inter")(x)
        h = ACT2FN[self.hidden_act](h)
        h = dense(self.hidden_size, self.dtype, "out")(h)
        h = nn.Dropout(self.hidden_dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="out_ln")(h + x)


class TransformerLayer(nn.Module):
    """Self-attention block + FFN (reference BertLayer / BertImageLayer)."""
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str
    attn_dropout: float
    hidden_dropout: float
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, additive_mask, deterministic: bool = True):
        x = SelfAttention(self.hidden_size, self.num_heads, self.attn_dropout,
                          self.hidden_dropout, self.layer_norm_eps, self.dtype,
                          self.use_pallas, name="attention")(
            x, additive_mask, deterministic)
        return FeedForward(self.hidden_size, self.intermediate_size,
                           self.hidden_act, self.hidden_dropout,
                           self.layer_norm_eps, self.dtype, name="ffn")(
            x, deterministic)


class BiAttention(nn.Module):
    """Bi-directional cross attention between vision (1) and text (2)
    (reference BertBiAttention, vilbert.py:619-725).

    Text queries attend vision keys/values (producing context1 for the text
    side of the outputs) and vision queries attend text keys/values, both in
    one module with a shared bi_hidden head layout.
    """
    bi_hidden_size: int
    num_heads: int
    v_attn_dropout: float
    t_attn_dropout: float
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, v_input, v_mask, t_input, t_mask,
                 deterministic: bool = True):
        H = self.num_heads
        # vision projections
        q1 = dense(self.bi_hidden_size, self.dtype, "v_query")(v_input)
        k1 = dense(self.bi_hidden_size, self.dtype, "v_key")(v_input)
        val1 = dense(self.bi_hidden_size, self.dtype, "v_value")(v_input)
        # text projections
        q2 = dense(self.bi_hidden_size, self.dtype, "t_query")(t_input)
        k2 = dense(self.bi_hidden_size, self.dtype, "t_key")(t_input)
        val2 = dense(self.bi_hidden_size, self.dtype, "t_value")(t_input)

        rng1 = (self.make_rng("dropout")
                if (not deterministic and self.v_attn_dropout > 0) else None)
        rng2 = (self.make_rng("dropout")
                if (not deterministic and self.t_attn_dropout > 0) else None)
        # text queries -> vision keys/values (context for the text stream)
        ctx1 = dot_product_attention(
            split_heads(q2, H), split_heads(k1, H), split_heads(val1, H),
            v_mask, dropout_rate=self.v_attn_dropout,
            deterministic=deterministic, dropout_rng=rng1,
            use_pallas=self.use_pallas)
        # vision queries -> text keys/values (context for the vision stream)
        ctx2 = dot_product_attention(
            split_heads(q1, H), split_heads(k2, H), split_heads(val2, H),
            t_mask, dropout_rate=self.t_attn_dropout,
            deterministic=deterministic, dropout_rng=rng2,
            use_pallas=self.use_pallas)
        return merge_heads(ctx1), merge_heads(ctx2)


class ConnectionLayer(nn.Module):
    """Co-attention block: bi-attention + per-stream projections + FFNs
    (reference BertConnectionLayer/BertBiOutput, vilbert.py:728-788).

    Note the reference's cross-wiring (vilbert.py:780): the text-side context
    (bi_output2 == ctx2, vision-queries-over-text) is projected by dense1 onto
    the vision residual, and ctx1 by dense2 onto the text residual.
    """
    v_hidden_size: int
    t_hidden_size: int
    bi_hidden_size: int
    bi_num_heads: int
    v_intermediate_size: int
    t_intermediate_size: int
    v_hidden_act: str
    t_hidden_act: str
    v_attn_dropout: float
    t_attn_dropout: float
    v_hidden_dropout: float
    t_hidden_dropout: float
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, v_input, v_mask, t_input, t_mask,
                 deterministic: bool = True):
        ctx1, ctx2 = BiAttention(
            self.bi_hidden_size, self.bi_num_heads, self.v_attn_dropout,
            self.t_attn_dropout, self.dtype, self.use_pallas,
            name="biattention")(v_input, v_mask, t_input, t_mask, deterministic)

        # BertBiOutput (vilbert.py:746-758) with arguments
        # (hidden1=ctx2, input1=v_input, hidden2=ctx1, input2=t_input)
        h1 = dense(self.v_hidden_size, self.dtype, "v_dense")(ctx2)
        h1 = nn.Dropout(self.v_hidden_dropout)(h1, deterministic=deterministic)
        v_out = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name="v_ln")(h1 + v_input)
        h2 = dense(self.t_hidden_size, self.dtype, "t_dense")(ctx1)
        h2 = nn.Dropout(self.t_hidden_dropout)(h2, deterministic=deterministic)
        t_out = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name="t_ln")(h2 + t_input)

        v_out = FeedForward(self.v_hidden_size, self.v_intermediate_size,
                            self.v_hidden_act, self.v_hidden_dropout,
                            self.layer_norm_eps, self.dtype, name="v_ffn")(
            v_out, deterministic)
        t_out = FeedForward(self.t_hidden_size, self.t_intermediate_size,
                            self.t_hidden_act, self.t_hidden_dropout,
                            self.layer_norm_eps, self.dtype, name="t_ffn")(
            t_out, deterministic)
        return v_out, t_out


def extended_attention_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] {0,1} -> additive [B, 1, 1, L] (reference vilbert.py:1380-1396)."""
    m = mask.astype(dtype)
    return ((1.0 - m) * MASK_VALUE)[:, None, None, :]
