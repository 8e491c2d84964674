"""Hybrid regression heads (reference CRCT/backbone/regressor.py).

The regressor consumes the pre-pooler CLS states of both streams
(hw_0 = text[:, 0], hv_0 = vision[:, 0]; reference vilbert.py:1599-1601) and
produces either a Tanh-bounded scalar (PlotQA) or a 65-way softmax over the
legal DVQA float table (CE variant). Unlike the reference's dynamic
``needs_regression`` boolean subset, the head always runs on the full batch;
losses/outputs are masked downstream — fixed shapes for XLA.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from crct_tpu.models.layers import BERT_INIT


class _Pipe(nn.Module):
    """LeakyReLU MLP pipe: dims[0] -> ... -> dims[-1] (last layer linear)."""
    dims: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype, kernel_init=BERT_INIT,
                         name=f"dense_{i}")(x)
            if i < len(self.dims) - 1:
                x = nn.leaky_relu(x)
        return x


class HybridRegressor(nn.Module):
    """PlotQA_Regressor_v20 (reference regressor.py:5-42): txt/vis pipes to
    256-d, concat, fusion MLP to a Tanh scalar."""
    hidden_size: int
    v_hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hv_0, hw_0):
        hw = _Pipe((self.hidden_size, 512, 256, 256), self.dtype,
                   name="txt_pipe")(hw_0)
        hv = _Pipe((self.v_hidden_size, 512, 256, 256), self.dtype,
                   name="vis_pipe")(hv_0)
        pre = jnp.concatenate([hv, hw], axis=-1)
        fused = _Pipe((512, 256, 256), self.dtype, name="fusion_hidden")(pre)
        fused = nn.leaky_relu(fused)
        out = nn.Dense(1, dtype=self.dtype, kernel_init=BERT_INIT,
                       name="fusion_out")(fused)
        return jnp.tanh(out)[..., 0]


class CERegressor(nn.Module):
    """DVQA_Regressor_v20_CE (reference regressor.py:45-82): same pipes,
    65-way softmax head over the legal DVQA float bins."""
    hidden_size: int
    v_hidden_size: int
    num_bins: int = 65
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hv_0, hw_0):
        hw = _Pipe((self.hidden_size, 512, 256, 256), self.dtype,
                   name="txt_pipe")(hw_0)
        hv = _Pipe((self.v_hidden_size, 512, 256, 256), self.dtype,
                   name="vis_pipe")(hv_0)
        pre = jnp.concatenate([hv, hw], axis=-1)
        fused = _Pipe((512, 256, 256), self.dtype, name="fusion_hidden")(pre)
        fused = nn.leaky_relu(fused)
        logits = nn.Dense(self.num_bins, dtype=self.dtype, kernel_init=BERT_INIT,
                          name="fusion_out")(fused)
        # the reference applies Softmax inside the head (regressor.py:73)
        return nn.softmax(logits, axis=-1)
