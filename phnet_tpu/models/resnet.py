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
import jax
import jax.numpy as jnp

from ..ops.batchnorm import FusedBatchNorm
from ..ops.pool import max_pool_3x3_s2

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}


def space_to_depth_stem(x: jnp.ndarray, kernel: jnp.ndarray,
                        dtype: jnp.dtype = jnp.float32,
                        pre_packed: bool = False) -> jnp.ndarray:
    """The 7x7/stride-2/pad-3 stem conv, computed exactly as a 4x4/stride-1
    conv on a 2x2 space-to-depth input (the MLPerf ResNet TPU trick).

    A 3-input-channel conv occupies 3 of the MXU's 128 contraction lanes;
    space-to-depth moves the 2x2 spatial phase into channels (3 -> 12) at
    identical FLOPs. Derivation: output row i of the original conv reads
    input rows ``2i + di - 3`` for tap ``di in [0, 7)``; writing the input
    row as ``2(i + kh - 2) + p`` over the SD grid gives ``di = 2 kh + p - 1``
    with ``kh in [0, 4)``, ``p in {0, 1}`` — a 4x4 kernel over the SD input
    with padding (2, 1), where the (kh=0, p=0) taps (di = -1) are zero.
    Same parameters (the [7,7,C,O] kernel is rearranged in-graph: a pad +
    reshape of 9.4k floats, negligible), so checkpoints, the torchvision
    import, and training are untouched; exact up to float reassociation.

    Measured (v5e, 2026-08-18, whole-video bf16 graph): a wash — e2e
    1.25 vs 1.26 ms/frame, encoder-only 0.52 vs 0.51. XLA's own conv
    lowering already handles the thin-channel stem well at this (360x640)
    resolution, so ``conv7`` stays the default; the option remains for
    larger inputs where the stem is a bigger fraction.

    x: [B, H, W, C] with H, W even; kernel: [7, 7, C, O]. Returns
    [B, H/2, W/2, O].
    """
    if pre_packed:
        b = x.shape[0]
        c = x.shape[-1] // 4
    else:
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
    o = kernel.shape[-1]
    k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # tap -1 row/col
    k = k.reshape(4, 2, 4, 2, c, o)  # [kh, p, kw, q, c, o]
    k_sd = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, o)
    # The 6-D reshape/transpose lowers to ~0.6 ms of layout copies on the
    # B=8 serving tick (xplane 2026-08-21, copy.1020/copy.1022) — but the
    # "obvious" fix, strided slices + concat over the 2x2 phases, measured
    # WORSE (9.35 vs 7.55 ms/tick: four [B,H/2,W/2,3] strided gathers on
    # the minor dims defeat the tiler far harder than one transpose), so
    # the transpose form stays.
    if pre_packed:
        x_sd = x  # already [B, H/2, W/2, 4C] (loader-emitted s2d)
    else:
        x_sd = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x_sd = x_sd.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // 2, w // 2, 4 * c)
    return jax.lax.conv_general_dilated(
        x_sd.astype(dtype), k_sd.astype(dtype),
        window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def width_packed_stem(x: jnp.ndarray, kernel: jnp.ndarray,
                      dtype: jnp.dtype = jnp.float32,
                      pre_packed: bool = False) -> jnp.ndarray:
    """The 7x7/stride-2/pad-3 stem conv as a 7x4/stride-(2,1) conv on a
    width-packed input — the ZERO-copy variant of the space-to-depth trick.

    ``space_to_depth_stem``'s full 2x2 packing needs a 6-D transpose that
    lowers to ~0.93 ms of thin-channel layout copies on the B=8 serving
    tick (xplane 2026-08-21, copy.1019/1020/1022 — minor dims (2, 3) give
    terrible lane utilization for the copy). Packing only the WIDTH phase
    is free: in row-major [H, W, C] memory, the channel triples of
    columns (2m, 2m+1) are already adjacent, so [B, H, W/2, 2C] is a pure
    reshape — no data movement — and the conv still gets 6 contraction
    lanes instead of 3.

    Derivation: output col j reads orig cols ``2j + dj - 3``; writing the
    col as ``2m + q`` gives ``m = j + kw - 2``, ``dj = 2 kw + q - 1`` with
    ``kw in [0, 4)``, ``q in {0, 1}`` — a [7, 4, 2C, O] kernel over the
    packed input with width padding (2, 1), height unchanged (7 taps,
    stride 2, pad 3); the (kw=0, q=0) taps (dj = -1) are zero. Same
    [7,7,C,O] parameters, rearranged in-graph; exact up to float
    reassociation (``tests/test_model.py::test_width_packed_stem_exact``).

    x: [B, H, W, C] with W even; kernel: [7, 7, C, O] -> [B, H/2, W/2, O].
    With ``pre_packed`` the input already arrives width-packed
    [B, H, W/2, 2C] (e.g. the serving host packs frames with a
    zero-cost numpy reshape) — even the "free" in-graph reshape is a
    TILED-layout change on TPU (3->6 lanes) that costs a real copy
    (0.42 ms of the B=8 serving tick, xplane 2026-08-21).
    """
    if pre_packed:
        b, h, w2, c2 = x.shape
        c = c2 // 2
        x_p = x
    else:
        b, h, w, c = x.shape
        assert w % 2 == 0, (h, w)
        x_p = x.reshape(b, h, w // 2, 2 * c)
    o = kernel.shape[-1]
    k = jnp.pad(kernel, ((0, 0), (1, 0), (0, 0), (0, 0)))  # dj=-1 tap col
    k = k.reshape(7, 4, 2 * c, o)  # [kh, kw, (q, c), o]
    return jax.lax.conv_general_dilated(
        x_p.astype(dtype), k.astype(dtype),
        window_strides=(2, 1), padding=((3, 3), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Norm(nn.Module):
    kind: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            # fused-backward BatchNorm (ops/batchnorm.py): same params,
            # same batch_stats, same math as nn.BatchNorm — the training
            # backward runs ONE variadic reduce pass instead of flax's
            # autodiff ~3 (the round-5 trace's ~15 ms/step of big
            # convert_reduce passes). Child name pins the flax layout.
            return FusedBatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                name="BatchNorm_0",
            )(x, use_running_average=not train)
        if self.kind == "batch_flax":
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
    stem: str = "auto"  # "auto" | "conv7" | "space_to_depth" |
    # "width_packed" — all the same function over the same params; "auto"
    # picks width_packed on TPU (B=8 serving A/B 2026-08-21: 1097.4 agg
    # fps vs s2d 1061.7 vs conv7 999.4 — zero layout copies beats the
    # fuller 12-lane packing) and conv7 on other backends (bit-exact
    # torch-reference form)
    pool_vjp: str = "scatter"  # "scatter" (XLA select-and-scatter
    # default; measured faster, see BackboneConfig.pool_vjp) | "onehot"
    # (ops/pool.py custom VJP) — forward is identical
    packed_input: str = "none"  # "none" | "width" ([B, H, W/2, 2C],
    # width_packed stem) | "s2d" ([B, H/2, W/2, 4C], space_to_depth
    # stem) — pre-packed serving ingestion; param shapes unchanged
    # (see ModelConfig.packed_frames)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        blocks = STAGE_BLOCKS[self.depth]
        block_cls = BasicBlock if self.depth < 50 else Bottleneck
        stem = self.stem
        if stem == "auto":
            stem = ("width_packed" if jax.default_backend() == "tpu"
                    else "conv7")
        packed = self.packed_input
        if packed == "width":
            assert stem == "width_packed", (
                "packed_input='width' requires the width_packed stem")
        elif packed == "s2d":
            assert stem == "space_to_depth", (
                "packed_input='s2d' requires the space_to_depth stem")
        if stem in ("space_to_depth", "width_packed"):
            # same "Conv_0/kernel" param tree as the nn.Conv branch (the
            # dict-valued-param trick from dynamic_conv._dense_param), so
            # the three stems are checkpoint-interchangeable
            div = {"none": 1, "width": 2, "s2d": 4}[packed]
            in_c = x.shape[-1] // div
            p = self.param(
                "Conv_0",
                lambda key: {"kernel": nn.initializers.lecun_normal()(
                    key, (7, 7, in_c, 64))},
            )
            if stem == "space_to_depth":
                x = space_to_depth_stem(x, p["kernel"], self.dtype,
                                        pre_packed=packed == "s2d")
            else:
                x = width_packed_stem(x, p["kernel"], self.dtype,
                                      pre_packed=packed == "width")
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=self.dtype)(x)
        x = Norm(self.norm, self.dtype)(x, train)
        x = nn.relu(x)
        if self.pool_vjp == "onehot":
            x = max_pool_3x3_s2(x)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        outs = []
        for stage, (planes, n_blocks) in enumerate(zip(self.stage_channels, blocks)):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block_cls(planes, stride, self.norm, self.dtype)(x, train)
            outs.append(x)
        return tuple(outs)
