"""ResNet backbone with multi-level outputs (flax.linen, NHWC).

Equivalent of the reference's torchvision-style backbone
(``libs/models/resnet.py:148-319``): conv7x7/s2 stem, maxpool, four stages,
returning the per-stage feature list. TPU-first choices: NHWC layout,
BatchNorm whose statistics are computed over the *global* (sharded) batch
under jit — the reference's ``SyncBatchNorm.convert_sync_batchnorm``
(``trainVIL.py:156``) falls out of GSPMD for free. GroupNorm is available as
a batch-independent alternative.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}


class Norm(nn.Module):
    kind: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        return nn.GroupNorm(num_groups=min(32, x.shape[-1]), dtype=self.dtype)(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        y = Norm(self.norm, self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = Norm(self.norm, self.dtype)(y, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype)(x)
            identity = Norm(self.norm, self.dtype)(identity, train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = Norm(self.norm, self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(y)
        y = Norm(self.norm, self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = Norm(self.norm, self.dtype)(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype)(x)
            identity = Norm(self.norm, self.dtype)(identity, train)
        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    """Multi-level ResNet.

    Returns the outputs of the four residual stages as a tuple (strides
    4, 8, 16, 32), matching the reference's ``ResNet.forward`` output list.
    """

    depth: int = 18
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        blocks = STAGE_BLOCKS[self.depth]
        block_cls = BasicBlock if self.depth < 50 else Bottleneck
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = Norm(self.norm, self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for stage, (planes, n_blocks) in enumerate(zip(self.stage_channels, blocks)):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block_cls(planes, stride, self.norm, self.dtype)(x, train)
            outs.append(x)
        return tuple(outs)
