"""Adaptive per-anchor difficulty router.

Reference ``libs/models/Router.py:39-81`` (``AdaptiveRouter4Lane``): per
refine stage, LayerNorm over the pooled [C, P] anchor feature plane, four
residual blocks of per-anchor depthwise 3x3 convs (groups = num_priors,
i.e. each anchor's [C, P] plane has its own kernel), then an MLP
``C*P -> C*P/reduction -> 1`` ending in ReLU, squashed by sigmoid.

Because the MLP ends in ReLU, the routed score lives in [0.5, 1): a
faithful reproduction — the VIL hard-selection ``diff >= 0.5``
(``RouterV4.py:500``) therefore always picks the second branch at
inference, exactly as the reference does.

The router always sees stop-gradient features (``RouterV4.py:240``); its
training signal comes only from the loss-blending term.

TPU mapping: the residual block chain is small bandwidth-bound VPU work.
Per-op device profiling (see ``utils/xplane.py``) showed XLA's own fusion
of the chain beats both hand-written Pallas layouts by ~2x (58us vs
107-114us per call on v5e) — the 3x3's +-1 shifted accesses are the
problem for Pallas (misaligned sublane RMWs / non-tile-multiple lane
rolls), so the XLA path is the default for inference AND training; the
Pallas kernel remains available behind ``use_pallas_kernel`` for A/B
measurement (:mod:`phnet_tpu.ops.router_pallas`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.router_pallas import (
    _conv3x3, _conv3x3_flat, _ln, _ln_flat, fused_router_blocks,
)


class LayerNormCP(nn.Module):
    """LayerNorm over the joint (C, P) trailing dims with elementwise affine,
    matching ``nn.LayerNorm([C, P])`` in the reference. (Used by modules
    outside the fused router.)"""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        c, p = x.shape[-2], x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
        var = jnp.var(xf, axis=(-2, -1), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(dtype)
        scale = self.param("scale", nn.initializers.ones, (c, p))
        bias = self.param("bias", nn.initializers.zeros, (c, p))
        return y * scale.astype(dtype) + bias.astype(dtype)


def _ln_params_init(blocks: int, c: int, p: int):
    def init(key, shape):
        del key
        assert shape == (2 + 4 * blocks, c, p)
        arr = jnp.zeros(shape)
        # scale entries (even offsets within each scale/bias pair) = 1
        idx = [0] + [2 + 4 * b + o for b in range(blocks) for o in (0, 2)]
        return arr.at[jnp.array(idx)].set(1.0)

    return init


class AdaptiveRouter(nn.Module):
    """Per-stage difficulty scores in (0, 1); call once per stage."""

    num_anchors: int = 240
    channels: int = 64
    points: int = 36
    reduction: int = 4
    blocks: int = 4
    dtype: jnp.dtype = jnp.float32  # MLP compute dtype
    # Per-op device timing (xplane trace, v5e): XLA's own fusion of the
    # residual chain runs ~58us/call; the hand-written Pallas kernels are
    # 114us (lane-layout v1) / 107us (sublane-layout v2) -- the per-anchor
    # depthwise 3x3's +-1 shifted accesses defeat both Pallas layouts
    # (misaligned sublane RMWs resp. non-tile-multiple lane rolls), while
    # XLA picks better shuffle sequences. Default is therefore the XLA
    # path everywhere; the kernel stays available for A/B measurement.
    use_pallas_kernel: bool = False
    # Serve the conv chain with bf16 intermediates at XLA fusion
    # boundaries (stats/taps still compute in f32 via promotion). The
    # chain is f32 by parity design for training; this inference-only
    # flag halves the [B*A, C, P] buffers that spill VMEM at large
    # serving batches (B=8->16 tick: 1.07 -> 5.92 ms, xplane
    # 2026-08-19). A/B per deployment; off by default.
    chain_bf16: bool = False
    # force the f32 chain in training regardless of self.dtype (the
    # HeadConfig.router_train_chain_f32 A/B switch).
    train_chain_f32: bool = False
    # chain layout: "plane" keeps [T, C, P] (P=36 pads to 128 lanes —
    # 28% lane utilization on every chain op); "flat" runs the whole
    # chain in [T, C*P] (2304 = 18 exact lane tiles, no padding waste)
    # with the depthwise 3x3 as nine masked flat shifts — bit-identical
    # adds in the same order (ops/router_pallas._conv3x3_flat).
    chain_impl: str = "plane"

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """feats: [B, A, C, P] (pre stop-gradient by caller) -> [B, A, 1]."""
        a, c, p = self.num_anchors, self.channels, self.points
        # per-anchor conv taps (torch Conv2d groups=A kaiming-uniform-ish)
        taps = self.param(
            "taps",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / 3.0, maxval=1.0 / 3.0),
            (a, self.blocks * 2 * 9),
        )
        conv_bias = self.param(
            "conv_bias", nn.initializers.zeros, (a, self.blocks * 2))
        ln_params = self.param(
            "ln_params", _ln_params_init(self.blocks, c, p),
            (2 + 4 * self.blocks, c, p))

        use_pallas = (
            self.use_pallas_kernel and not train and self.blocks > 0
            and jax.default_backend() == "tpu"
        )
        if use_pallas:
            run = lambda f: fused_router_blocks(  # noqa: E731
                f, taps, conv_bias, ln_params, blocks=self.blocks)
            x = jax.vmap(run)(feats.astype(jnp.float32))
        else:
            # the 9-shifted-tap formulation: measured fastest of three
            # implementations on v5e (58us/chain vs 114us Pallas vs ~375us
            # banded-matmul — see ops/router_pallas.py for the A/B notes)
            b = feats.shape[0]
            # chain_bf16 must narrow EVERY producer XLA might pick as a
            # fusion boundary: a trailing .astype on the block output is
            # not enough — the conv outputs and LN outputs are f32 unless
            # their *operands* are cast, and one 70 MB f32 [B*A, C, P]
            # buffer per boundary is what spills VMEM at serving batches
            # (xplane B=32: 12 such fusions, ~14% of the tick, WITH the
            # old flag on). Stats (mean/var) still compute in f32 inside
            # _ln regardless of operand dtype.
            # Training follows the model-wide mixed-precision policy
            # (self.dtype = compute_dtype): the xplane account of the
            # B=4 train step (ROADMAP round 4) shows the backward scan
            # dominated by this chain's f32 [B*A, C, P] remat recompute
            # and its LN/tap param-grad reductions — bf16 halves those
            # bytes. Stats still compute in f32 inside _ln; parity tests
            # run compute_dtype=f32 and are bit-identical. Inference keeps
            # the measured per-batch policy (chain_bf16 / serving auto).
            if train:
                cdtype = jnp.float32 if self.train_chain_f32 else self.dtype
            else:
                cdtype = jnp.bfloat16 if self.chain_bf16 else jnp.float32
            taps_b = jnp.tile(taps, (b, 1)).astype(cdtype)
            bias_b = jnp.tile(conv_bias, (b, 1)).astype(cdtype)
            if self.chain_impl == "flat":
                lnp = ln_params.reshape(2 + 4 * self.blocks, c * p)
                x = feats.astype(jnp.float32).reshape(b * a, c * p)
                x = _ln_flat(x, lnp[0], lnp[1]).astype(cdtype)
                for blk in range(self.blocks):
                    t1 = taps_b[:, (2 * blk) * 9: (2 * blk + 1) * 9]
                    t2 = taps_b[:, (2 * blk + 1) * 9: (2 * blk + 2) * 9]
                    o = 2 + 4 * blk
                    y = _conv3x3_flat(
                        x, t1, bias_b[:, 2 * blk], c, p).astype(cdtype)
                    y = _ln_flat(y, lnp[o], lnp[o + 1]).astype(cdtype)
                    y = jnp.maximum(y, 0.0)
                    y = _conv3x3_flat(
                        y, t2, bias_b[:, 2 * blk + 1], c, p).astype(cdtype)
                    y = _ln_flat(y, lnp[o + 2], lnp[o + 3]).astype(cdtype)
                    x = jnp.maximum(y + x, 0.0).astype(cdtype)
            else:
                x = feats.astype(jnp.float32).reshape(b * a, c, p)
                x = _ln(x, ln_params[0], ln_params[1]).astype(cdtype)
                for blk in range(self.blocks):
                    t1 = taps_b[:, (2 * blk) * 9: (2 * blk + 1) * 9]
                    t2 = taps_b[:, (2 * blk + 1) * 9: (2 * blk + 2) * 9]
                    o = 2 + 4 * blk
                    y = _conv3x3(x, t1, bias_b[:, 2 * blk]).astype(cdtype)
                    y = _ln(y, ln_params[o], ln_params[o + 1]).astype(cdtype)
                    y = jnp.maximum(y, 0.0)
                    y = _conv3x3(y, t2, bias_b[:, 2 * blk + 1]).astype(cdtype)
                    y = _ln(y, ln_params[o + 2],
                            ln_params[o + 3]).astype(cdtype)
                    x = jnp.maximum(y + x, 0.0).astype(cdtype)

        x = x.reshape(*feats.shape[:-2], c * p).astype(self.dtype)
        hidden = c * p // self.reduction
        tanh_gain = 5.0 / 3.0
        init = nn.initializers.variance_scaling(
            tanh_gain**2, "fan_avg", "uniform"
        )  # xavier_uniform with tanh gain (Router.py:70-74)
        h = nn.Dense(hidden, kernel_init=init, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(1, kernel_init=init, dtype=self.dtype)(h)
        h = nn.relu(h)
        return jax.nn.sigmoid(h.astype(jnp.float32))
