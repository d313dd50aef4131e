"""Fused Pallas kernel for the adaptive router's residual block chain.

The router's four residual blocks (per-anchor depthwise 3x3 conv ->
LayerNorm[C,P] -> relu -> conv -> LayerNorm, + residual;
``Router.py:53-81``) are tiny bandwidth-bound ops.

Kernel geometry: anchors ride the TPU *lane* dimension. The feature volume
is laid out as [C*P, A] with 128-anchor lane blocks; the depthwise 3x3
becomes nine statically-shifted partial-row accumulations into a VMEM
scratch (shift along C = +-P rows, along P = +-1 row; out-of-plane rows
masked by row iotas), and the per-anchor LayerNorm is a column reduction.
The whole chain runs on two ping-pong scratch buffers — each anchor plane
is read from HBM once and written once, with a small, fixed VMEM footprint.

STATUS — measured slower than XLA, kept for A/B only. Per-op device
timing on v5e (xplane trace, 240x64x36 geometry): this kernel 114us/call;
an anchors-on-sublanes rewrite using lane rolls 107us; XLA's own fusion
of the identical math 58us. The +-1-shift structure of the depthwise 3x3
defeats both Pallas layouts (misaligned sublane RMWs resp.
non-tile-multiple lane rolls that cross lane tiles), while XLA emits
better shuffle sequences. :class:`phnet_tpu.models.router.AdaptiveRouter`
therefore defaults to the XLA path (``use_pallas_kernel=False``); the
equivalence test below keeps this kernel honest should the trade-off be
revisited on new hardware/toolchains.

Forward-only by design: gradients flow through the XLA reference path
(same parameters, same math — equivalence-tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --- XLA reference math (training path; also the equivalence oracle) -----
def _ln(x, scale, bias, eps=1e-5):
    """LayerNorm over the (C, P) plane per anchor; x: [T, C, P].

    Fast-variance form (var = E[x^2] - E[x]^2, clipped, flax's own
    default policy): both stat reduces are independent reads of the same
    input so XLA can fuse them into one multi-output reduction, where
    ``jnp.var``'s E[(x - mean)^2] forces a second dependent pass.
    Measured (2026-08-21): a WASH on both the B=8 serving tick (1191.9
    vs 1199.0 agg fps) and the B=4 train step (215.8 vs 214.2) — XLA
    evidently already handled the dependent pair well — kept for the
    structurally independent reads; parity suites green either way."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale[None] + bias[None]


def _conv3x3(x, taps, bias):
    """Per-anchor depthwise 3x3 over (C, P) with zero padding.

    x: [T, C, P]; taps: [T, 9]; bias: [T]."""
    t, c, p = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    y = jnp.zeros_like(x)
    k = 0
    for i in range(3):
        for j in range(3):
            y = y + taps[:, k][:, None, None] * jax.lax.slice(
                xp, (0, i, j), (t, i + c, j + p))
            k += 1
    return y + bias[:, None, None]


def _ln_flat(x, scale, bias, eps=1e-5):
    """LayerNorm over the flattened (C*P) plane per anchor; x: [T, C*P],
    scale/bias: [C*P]. Same math as :func:`_ln` on the unflattened plane
    (the reduction runs over the identical element set)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale[None] + bias[None]


def _flat_shift(x, o: int):
    """y[:, m] = x[:, m + o], zero out of range (pad+slice, no gather)."""
    if o == 0:
        return x
    n = x.shape[1]
    if o > 0:
        return jnp.pad(x[:, o:], ((0, 0), (0, o)))
    return jnp.pad(x[:, : n + o], ((0, 0), (-o, 0)))


def _conv3x3_flat(x, taps, bias, c: int, p: int):
    """:func:`_conv3x3` on the FLAT [T, C*P] layout: the depthwise 3x3
    over the (C, P) plane becomes nine statically-shifted adds on the
    flat axis (offset ``dc*P + dp``) with P-boundary masks for the
    ``dp != 0`` taps (a flat +-1 shift would otherwise wrap across C
    rows; the C-boundary falls out of the zero-padded shifts).

    Why flat: [C, P] = [64, 36] pads P to 128 lanes — every planar chain
    op runs at 28% lane utilization; C*P = 2304 is exactly 18 lane tiles,
    so the flat chain wastes nothing. Same adds in the same tap order
    (the flat LN's reduction tree differs, so chain equality is float-
    tolerance ~1e-6, not bit-exact).

    STATUS — MEASURED NEGATIVE, kept for A/B only
    (``HeadConfig.router_chain_impl``): v5e 2026-08-21, train B=4 190.8
    vs 216.1 clip-fps, serving B=8 641 vs 1097 agg fps. The flat +-1 /
    +-35 / +-37 shifts cross lane-tile boundaries every tile — the exact
    failure mode that sank the Pallas lane-roll kernel (see module
    docstring) — and that costs far more than the planar layout's 3.5x
    padding waste. Lane padding is cheap; cross-tile lane movement is
    not.
    """
    t, cp = x.shape
    pcol = jnp.arange(cp) % p
    not_first = (pcol > 0).astype(x.dtype)[None]
    not_last = (pcol < p - 1).astype(x.dtype)[None]
    y = jnp.zeros_like(x)
    k = 0
    for dc in (-1, 0, 1):
        for dp in (-1, 0, 1):
            sh = _flat_shift(x, dc * p + dp)
            if dp == -1:
                sh = sh * not_first
            elif dp == 1:
                sh = sh * not_last
            y = y + taps[:, k][:, None] * sh
            k += 1
    return y + bias[:, None]


def banded_taps(taps, p: int):
    """Pack 3x3 taps into per-anchor banded matmul weights.

    taps: [T, 9] (offset order dc-major: k = 3*(dc+1) + (dp+1)).
    Returns W [T, 3, P, P] with ``W[t, dc, q, r] = taps[t, 3*dc + (q-r+1)]``
    for |q-r| <= 1, so the depthwise conv becomes
    ``y = einsum('tkcq,tkqr->tcr', stack_of_C_shifted_x, W)``.
    Depends only on parameters — loop-invariant across the frame scan.

    STATUS — measured SLOWER than the 9-tap formulation and kept only as a
    documented negative result: the per-anchor [64,36]@[36,36] matmuls use
    ~8% of an MXU tile, giving ~375us/chain on v5e vs 58us for
    :func:`_conv3x3`'s shifted-tap fusions. Equivalence-tested (exact when
    the contraction runs at HIGHEST precision)."""
    sup = jnp.eye(p, k=1)   # q - r = -1  (dp = -1)
    mid = jnp.eye(p)        # dp = 0
    sub = jnp.eye(p, k=-1)  # dp = +1
    bands = jnp.stack([sup, mid, sub])  # [3(dp), P, P]
    t9 = taps.reshape(taps.shape[0], 3, 3)  # [T, dc, dp]
    # elementwise broadcast-sum, NOT an einsum: the taps are parameters and
    # must not be rounded by a reduced matmul precision
    return (t9[:, :, :, None, None] * bands[None, None]).sum(axis=2)


def _conv3x3_banded(x, w_banded, bias):
    """Same math as :func:`_conv3x3` but as one MXU contraction.

    x: [T, C, P]; w_banded: [T, 3, P, P] from :func:`banded_taps`;
    bias: [T]. The nine shifted-tap accumulations (many small VPU fusions)
    become a single batched einsum against the precomputed tridiagonal
    weights; only the three C-shifts remain elementwise."""
    t, c, p = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    xs = jnp.stack([xp[:, :c], xp[:, 1:c + 1], xp[:, 2:]], 1)  # [T,3(dc),C,P]
    # HIGHEST precision (bf16x3 on the MXU) — the original formulation is
    # pure-f32 elementwise work, so the contraction must not drop to bf16
    y = jnp.einsum("tkcq,tkqr->tcr", xs, w_banded,
                   precision=jax.lax.Precision.HIGHEST)
    return y + bias[:, None, None]


# --- Pallas kernel ---------------------------------------------------------
def _router_blocks_kernel(x_ref, taps_ref, bias_ref, lnp_ref, out_ref,
                          xs_ref, ys_ref, *, blocks: int, c: int, p: int):
    """x/out: [C*P, An] lane block; taps: [blocks*18, An]; bias:
    [blocks*2, An]; lnp: [2 + blocks*4, C*P, 1]; xs/ys: VMEM scratch."""
    cp, a = x_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (cp, 1), 0)
    c_idx = rows // p
    p_idx = rows % p
    offsets = [(dc, dp) for dc in (-1, 0, 1) for dp in (-1, 0, 1)]
    masks = [
        (
            (c_idx + dc >= 0) & (c_idx + dc < c)
            & (p_idx + dp >= 0) & (p_idx + dp < p)
        ).astype(jnp.float32)
        for dc, dp in offsets
    ]

    def ln(x, j):
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=0, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * lnp_ref[j] + lnp_ref[j + 1]

    def conv_into(dst_ref, src_ref, tap_base, bias_idx):
        """dst <- depthwise3x3(src) + bias, as nine statically shifted
        partial-row accumulations (no full-array shifted temporaries)."""
        dst_ref[:] = jnp.broadcast_to(bias_ref[pl.ds(bias_idx, 1), :], (cp, a))
        for k, (dc, dp) in enumerate(offsets):
            off = dc * p + dp
            lo = max(0, -off)
            hi = cp - max(0, off)
            n = hi - lo
            tap = taps_ref[pl.ds(tap_base + k, 1), :]
            m = jax.lax.slice(masks[k], (lo, 0), (hi, 1))
            dst_ref[pl.ds(lo, n), :] = dst_ref[pl.ds(lo, n), :] + (
                tap * m
            ) * src_ref[pl.ds(lo + off, n), :]

    xs_ref[:] = ln(x_ref[:], 0)
    for b in range(blocks):
        o = 2 + 4 * b
        conv_into(ys_ref, xs_ref, 18 * b, 2 * b)
        ys_ref[:] = jnp.maximum(ln(ys_ref[:], o), 0.0)
        conv_into(out_ref, ys_ref, 18 * b + 9, 2 * b + 1)
        xs_ref[:] = jnp.maximum(ln(out_ref[:], o + 2) + xs_ref[:], 0.0)
    out_ref[:] = xs_ref[:]


@partial(jax.jit, static_argnames=("blocks", "interpret"))
def fused_router_blocks(
    feats: jnp.ndarray,   # [A, C, P] float32
    taps: jnp.ndarray,    # [A, blocks*2*9]
    biases: jnp.ndarray,  # [A, blocks*2]
    ln_params: jnp.ndarray,  # [2 + blocks*4, C, P]
    blocks: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    a, c, p = feats.shape
    cp = c * p
    lane_block = 128
    a_pad = -(-a // lane_block) * lane_block
    x = feats.astype(jnp.float32).transpose(1, 2, 0).reshape(cp, a)
    x = jnp.pad(x, ((0, 0), (0, a_pad - a)))
    taps_t = jnp.pad(taps.astype(jnp.float32).T, ((0, 0), (0, a_pad - a)))
    bias_t = jnp.pad(biases.astype(jnp.float32).T, ((0, 0), (0, a_pad - a)))
    lnp = ln_params.astype(jnp.float32).reshape(-1, cp, 1)

    out = pl.pallas_call(
        partial(_router_blocks_kernel, blocks=blocks, c=c, p=p),
        out_shape=jax.ShapeDtypeStruct((cp, a_pad), jnp.float32),
        grid=(a_pad // lane_block,),
        in_specs=[
            pl.BlockSpec((cp, lane_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps_t.shape[0], lane_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bias_t.shape[0], lane_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lnp.shape[0], cp, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cp, lane_block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cp, lane_block), jnp.float32),
            pltpu.VMEM((cp, lane_block), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, taps_t, bias_t, lnp)
    return out[:, :a].reshape(c, p, a).transpose(2, 0, 1)
