"""Feature Pyramid Network on top of the ResNet stages.

Lateral 1x1 + top-down nearest-upsample + 3x3 output convs producing P2-P5,
plus P6 (stride-2 maxpool of P5) for the RPN — the layout Detectron2's
R50-FPN config gives the reference detector (Detector/frcnn.py:138).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, [H, W, C] or [B, H, W, C]."""
    h_axis = x.ndim - 3
    x = jnp.repeat(x, 2, axis=h_axis)
    return jnp.repeat(x, 2, axis=h_axis + 1)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c_feats: Sequence[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, ...]:
        """c_feats: (C2, C3, C4, C5) -> (P2, P3, P4, P5, P6)."""
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i + 2}")(c)
            for i, c in enumerate(c_feats)
        ]
        # top-down pathway
        merged = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = upsample2x(merged[0])
            up = up[..., :lat.shape[-3], :lat.shape[-2], :]
            merged.insert(0, lat + up)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"output{i + 2}")(m)
            for i, m in enumerate(merged)
        ]
        p6 = nn.max_pool(outs[-1], (1, 1), (2, 2))
        return tuple(outs) + (p6,)
