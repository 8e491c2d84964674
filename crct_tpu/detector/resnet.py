"""ResNet backbone in Flax (the detector's CNN trunk).

Replaces Detectron2's ResNet (reference Detector/frcnn.py:138 uses
mask_rcnn_R_50_FPN; frcnn.py:147 R_101 for FigureQA). Uses frozen-style
batch norm (affine scale/bias with fixed running statistics folded in as
parameters) — the Detectron2 default for detection fine-tuning — which on
TPU is a pure elementwise op XLA fuses into the surrounding convs.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

BLOCKS_PER_STAGE = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                    14: (1, 1, 1, 1)}  # tiny trunk for tests


class FrozenBN(nn.Module):
    """Affine normalization with parameterized running stats (no updates)."""
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut when needed.

    ``stride_in_1x1``: Detectron2's model-zoo ResNets (Caffe2 heritage,
    STRIDE_IN_1X1=True) put the stride-2 on the first 1x1 conv; torchvision
    puts it on the 3x3. Must match the pretrained weights' convention."""
    filters: int            # bottleneck width; output is 4 * filters
    stride: int = 1
    dtype: Any = jnp.float32
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.filters * 4
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        shortcut = x
        if x.shape[-1] != out_ch or self.stride != 1:
            shortcut = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="shortcut")(x)
            shortcut = FrozenBN(out_ch, name="shortcut_bn")(shortcut)
        y = nn.Conv(self.filters, (1, 1), (s1, s1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(FrozenBN(self.filters, name="bn1")(y))
        y = nn.Conv(self.filters, (3, 3), (s3, s3),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(FrozenBN(self.filters, name="bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBN(out_ch, name="bn3")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """Returns the C2..C5 stage outputs (strides 4, 8, 16, 32).

    ``freeze_at``: Detectron2 semantics (reference default FREEZE_AT=2,
    i.e. stem + res2 frozen when fine-tuning from the model zoo) — a
    stop_gradient at the boundary keeps all earlier params fixed."""
    depth: int = 50
    dtype: Any = jnp.float32
    stride_in_1x1: bool = False
    freeze_at: int = 0

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        import jax
        blocks = BLOCKS_PER_STAGE[self.depth]
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        y = nn.relu(FrozenBN(64, name="stem_bn")(y))
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        if self.freeze_at == 1:
            y = jax.lax.stop_gradient(y)
        outs = []
        for stage, (n_blocks, filters) in enumerate(
                zip(blocks, (64, 128, 256, 512))):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = Bottleneck(filters, stride, self.dtype,
                               self.stride_in_1x1,
                               name=f"stage{stage + 2}_block{b}")(y)
            if self.freeze_at == stage + 2:
                y = jax.lax.stop_gradient(y)
            outs.append(y)
        return tuple(outs)  # C2, C3, C4, C5
