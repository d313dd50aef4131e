"""Stem max-pool (3x3 / stride 2 / pad 1) with a TPU-friendly custom VJP.

The reference stem (``libs/models/resnet.py:268``: ``nn.MaxPool2d(3, 2,
1)``) lowers, under autodiff, to XLA's ``select-and-scatter`` for the
backward pass — a serial per-window scatter that the round-4 B=4 train
profile measured at ~4.7 ms/step (14.1 ms over 3 steps, the single most
expensive top-level op; ``profiles/train_b4_2026-08-20.txt``). XLA has no
good TPU lowering for it.

STATUS — MEASURED NEGATIVE, kept for A/B only (``BackboneConfig.
pool_vjp``, default "scatter"). v5e B=4 unroll=1 train_bench
(2026-08-21): this VJP 171.6 clip-frames/s vs 216.1 with
select-and-scatter — the nine input-resolution interior-padded
accumulations below cost ~80 ms/step against the 4.7 ms they replace;
at [64,180,320,64] the select-and-scatter is already near its ~1.5 GB
bandwidth floor, so there was never 4x headroom here. The op and its
exactness tests stay as the documented A/B artifact.

This module keeps the forward as the standard ``reduce_window`` max and
replaces only the VJP with an equality-routed formulation built entirely
from static strided slices, compares, and interior-padded adds — all
layout/elementwise ops the TPU vectorizes:

    dx[i] = sum over the <=4 windows w covering i of
            [x[i] == y[w]] * g[w] / ties[w]

where ``ties[w]`` counts the elements of window ``w`` equal to its max.

Tie semantics: ``select-and-scatter`` routes the whole cotangent to the
FIRST max element of a window; this VJP SPLITS it equally among tied
maxima. The two differ only when a window's max is attained at several
positions, which for this stem means ReLU-zero plateaus (post BN+ReLU
input) — and those contributions are killed one op earlier anyway, since
``relu'(0) == 0`` routes no gradient into exactly-zero activations. For
windows with a unique max (the generic case) the routing is identical.
``tests/test_ops.py`` pins both: exact grad match vs the
select-and-scatter VJP on distinct values, and the documented split
behavior on ties.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool_fwd(x: jnp.ndarray) -> jnp.ndarray:
    """reduce_window max, NHWC, window 3, stride 2, pad 1 (same math as
    ``flax.linen.max_pool(x, (3,3), (2,2), ((1,1),(1,1)))``)."""
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _window_slices(xp: jnp.ndarray, ho: int, wo: int):
    """The nine [N, ho, wo, C] strided views of the padded input: slice
    (ky, kx) holds, for every window, its element at kernel offset
    (ky, kx). Static starts/strides — pure layout ops."""
    n, _, _, c = xp.shape
    views = []
    for ky in range(3):
        for kx in range(3):
            views.append(jax.lax.slice(
                xp,
                (0, ky, kx, 0),
                (n, ky + 2 * ho - 1, kx + 2 * wo - 1, c),
                (1, 2, 2, 1)))
    return views


@jax.custom_vjp
def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """Max pool, window 3x3, stride 2, padding 1, NHWC."""
    return _pool_fwd(x)


def _fwd(x):
    y = _pool_fwd(x)
    return y, (x, y)


def _bwd(res, g):
    x, y = res
    n, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    neg = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=neg)
    views = _window_slices(xp, ho, wo)
    ones = jnp.ones((), g.dtype)
    ties = sum(jnp.where(v == y, ones, 0) for v in views)
    contrib = g / ties
    # scatter each offset's masked contribution back with ONE interior-
    # padded lax.pad per offset (interior=1 re-inserts the stride-2 gaps,
    # edge pads place the (ky, kx) phase); summing the nine padded
    # tensors reconstructs dx over the padded extent.
    hp, wp = h + 2, w + 2
    acc = jnp.zeros((n, hp, wp, c), g.dtype)
    k = 0
    zero = jnp.zeros((), g.dtype)
    for ky in range(3):
        for kx in range(3):
            m = jnp.where(views[k] == y, contrib, zero)
            acc = acc + jax.lax.pad(
                m, zero,
                ((0, 0, 0),
                 (ky, hp - ky - (2 * ho - 1), 1),
                 (kx, wp - kx - (2 * wo - 1), 1),
                 (0, 0, 0)))
            k += 1
    return (jax.lax.slice(acc, (0, 1, 1, 0), (n, 1 + h, 1 + w, c)),)


max_pool_3x3_s2.defvjp(_fwd, _bwd)
