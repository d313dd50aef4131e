"""RevCol (Reversible Column Network) backbone option.

Equivalent of the reference's selectable RevCol backbone
(``libs/models/revcolV2.py``, ``RevCol/modules.py``; selected via
``cfg.backbone == 'revcol'`` in ``RouterV4.py:469-470``): a 4x4/s4 stem and
``num_subnet`` columns, each column fusing four levels reversibly:
``c_i <- alpha_i * c_i + Level_i(c_{i-1}, c_{i+1})`` with ConvNeXt blocks.

The reference's memory saving comes from a custom autograd that recomputes
activations by inverting the coupling (``RevCol/revcol_function.py:53-270``,
including manual RNG state juggling). The JAX-native equivalent is
``jax.checkpoint`` (rematerialization) around each column: identical
gradients and the same O(1)-columns activation memory, with none of the RNG
bookkeeping — the functional PRNG makes recomputation deterministic for
free.

Outputs the four level features of the last column (strides 4/8/16/32,
ResNet-compatible), so the same FPN/head stack applies.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    expansion: int = 4
    kernel_size: int = 3
    layer_scale_init: float = 1e-6
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dim, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2,
                    feature_group_count=self.dim, name="dwconv")(x)
        y = nn.LayerNorm(name="norm")(y)
        y = nn.Dense(self.dim * self.expansion, name="pw1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="pw2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        y = y * gamma
        if self.drop_path > 0.0 and train:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            y = y * mask / keep
        return x + y


class Fusion(nn.Module):
    """Level input fusion (``revcolV2.py:14-38``): downsample from the level
    below; for non-first columns also upsample from the level above."""

    level: int
    channels: Tuple[int, ...]
    first_col: bool

    @nn.compact
    def __call__(self, c_down, c_up):
        lvl = self.level
        if lvl > 0:
            down = nn.Conv(self.channels[lvl], (2, 2), strides=2, name="down")(c_down)
            down = nn.LayerNorm(name="down_norm")(down)
        else:
            down = c_down
        if self.first_col or lvl == 3 or c_up is None:
            return down
        up = nn.Dense(self.channels[lvl], name="up_proj")(c_up)
        b, h, w, c = up.shape
        up = jax.image.resize(up, (b, h * 2, w * 2, c), method="nearest")
        up = nn.LayerNorm(name="up_norm")(up)
        return down + up


class LevelBlocks(nn.Module):
    level: int
    channels: Tuple[int, ...]
    layers: Tuple[int, ...]
    kernel_size: int
    first_col: bool
    drop_path: float

    @nn.compact
    def __call__(self, c_down, c_up, train: bool = False):
        x = Fusion(self.level, self.channels, self.first_col, name="fusion")(
            c_down, c_up)
        for i in range(self.layers[self.level]):
            x = ConvNeXtBlock(
                self.channels[self.level], kernel_size=self.kernel_size,
                drop_path=self.drop_path, name=f"block{i}",
            )(x, train)
        return x


class SubNet(nn.Module):
    """One reversible column (``revcolV2.py:54-110``); alphas are clamped to
    |alpha| >= 1e-3 at use (the reference clamps in place each forward)."""

    channels: Tuple[int, ...]
    layers: Tuple[int, ...]
    kernel_size: int
    first_col: bool
    drop_path: float

    @nn.compact
    def __call__(self, x, c0, c1, c2, c3, train: bool = False):
        def alpha(i):
            a = self.param(f"alpha{i}", nn.initializers.constant(0.5),
                           (self.channels[i],))
            return jnp.sign(a) * jnp.maximum(jnp.abs(a), 1e-3)

        def level(i):
            return LevelBlocks(i, self.channels, self.layers, self.kernel_size,
                               self.first_col, self.drop_path, name=f"level{i}")

        if self.first_col:
            c0 = level(0)(x, None, train)
            c1 = level(1)(c0, None, train)
            c2 = level(2)(c1, None, train)
            c3 = level(3)(c2, None, train)
        else:
            c0 = alpha(0) * c0 + level(0)(x, c1, train)
            c1 = alpha(1) * c1 + level(1)(c0, c2, train)
            c2 = alpha(2) * c2 + level(2)(c1, c3, train)
            c3 = alpha(3) * c3 + level(3)(c2, None, train)
        return c0, c1, c2, c3


class RevColBackbone(nn.Module):
    """revcol_tiny defaults (``revcolV2.py:203-208``)."""

    channels: Tuple[int, ...] = (64, 128, 256, 512)
    layers: Tuple[int, ...] = (2, 2, 4, 2)
    num_subnet: int = 4
    kernel_size: int = 3
    drop_path: float = 0.1
    save_memory: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        x = nn.Conv(self.channels[0], (4, 4), strides=4, name="stem_conv")(x)
        x = nn.LayerNorm(name="stem_norm")(x)
        c0 = c1 = c2 = c3 = None
        for i in range(self.num_subnet):
            # rematerialize non-first columns on backward: the functional
            # stand-in for the reference's reversible recomputation
            cls = (
                nn.remat(SubNet, static_argnums=(6,))
                if (self.save_memory and i > 0)
                else SubNet
            )
            subnet = cls(
                self.channels, self.layers, self.kernel_size,
                first_col=(i == 0), drop_path=self.drop_path,
                name=f"subnet{i}",
            )
            c0, c1, c2, c3 = subnet(x, c0, c1, c2, c3, train)
        return (c0, c1, c2, c3)
