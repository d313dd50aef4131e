"""Fused Pallas router kernel vs the XLA reference path (same params)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.models.router import AdaptiveRouter
from phnet_tpu.ops.router_pallas import fused_router_blocks, _conv3x3, _ln


def test_fused_router_matches_xla_interpret():
    a, c, p, blocks = 32, 16, 12, 4
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(a, c, p)).astype(np.float32))
    taps = jnp.asarray(rng.normal(size=(a, blocks * 18)).astype(np.float32)) * 0.2
    biases = jnp.asarray(rng.normal(size=(a, blocks * 2)).astype(np.float32)) * 0.1
    lnp = jnp.asarray(rng.normal(size=(2 + 4 * blocks, c, p)).astype(np.float32))

    out_pl = fused_router_blocks(feats, taps, biases, lnp, blocks=blocks,
                                 interpret=True)

    # XLA reference: same math
    x = _ln(feats, lnp[0], lnp[1])
    for b in range(blocks):
        t1 = taps[:, (2 * b) * 9:(2 * b + 1) * 9]
        t2 = taps[:, (2 * b + 1) * 9:(2 * b + 2) * 9]
        o = 2 + 4 * b
        y = _conv3x3(x, t1, biases[:, 2 * b])
        y = _ln(y, lnp[o], lnp[o + 1])
        y = jnp.maximum(y, 0.0)
        y = _conv3x3(y, t2, biases[:, 2 * b + 1])
        y = _ln(y, lnp[o + 2], lnp[o + 3])
        x = jnp.maximum(y + x, 0.0)

    # bf16 kernel vs f32 reference: tight on average, loose on the tail
    diff = np.abs(np.array(out_pl) - np.array(x))
    assert diff.mean() < 0.01, diff.mean()
    assert diff.max() < 0.5, diff.max()


def test_router_train_eval_paths_agree():
    """XLA (train) path == kernel math at eval (on CPU the eval path also
    uses XLA, so this checks the train/eval flag plumbing + determinism)."""
    router = AdaptiveRouter(num_anchors=32, channels=16, points=12)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(1, 32, 16, 12)).astype(np.float32))
    v = router.init(jax.random.key(0), feats)
    out_train = router.apply(v, feats, train=True)
    out_eval = router.apply(v, feats, train=False)
    np.testing.assert_allclose(np.array(out_train), np.array(out_eval),
                               atol=1e-5)
    o = np.array(out_eval)
    assert o.min() >= 0.5 and o.max() < 1.0


def test_router_chain_bf16_close_and_train_exact():
    """chain_bf16 narrows only eval-path fusion-boundary buffers: train
    stays bit-identical to the f32 router, eval scores stay close (the
    routed score only gates diff>=0.5 / soft blending downstream)."""
    kw = dict(num_anchors=32, channels=16, points=12)
    router = AdaptiveRouter(**kw)
    router16 = AdaptiveRouter(chain_bf16=True, **kw)
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(2, 32, 16, 12)).astype(np.float32))
    v = router.init(jax.random.key(0), feats)
    np.testing.assert_array_equal(
        np.array(router.apply(v, feats, train=True)),
        np.array(router16.apply(v, feats, train=True)))
    ref = np.array(router.apply(v, feats, train=False))
    out = np.array(router16.apply(v, feats, train=False))
    # tolerance is machine/fusion dependent (bf16 rounding through 4
    # residual blocks; measured 0.031 max on one host, 0.02 on another);
    # the score only gates diff>=0.5 hard selection / soft blending, so
    # absolute closeness at 0.05 is the meaningful bar
    assert np.abs(out - ref).max() < 0.05, np.abs(out - ref).max()


def test_router_train_chain_f32_switch():
    """router_train_chain_f32 pins the TRAINING chain to f32 under a bf16
    mixed-precision policy (the A/B switch for the round-4 decision to let
    the train chain follow compute_dtype — ADVICE r4): with the flag the
    bf16-policy train chain must match the f32-policy eval chain exactly
    in its chain intermediates (MLP still runs in self.dtype, so compare
    against the bf16-MLP eval path, whose chain is also f32)."""
    kw = dict(num_anchors=32, channels=16, points=12, dtype=jnp.bfloat16)
    forced = AdaptiveRouter(train_chain_f32=True, **kw)
    plain = AdaptiveRouter(**kw)
    rng = np.random.default_rng(13)
    feats = jnp.asarray(rng.normal(size=(2, 32, 16, 12)).astype(np.float32))
    v = forced.init(jax.random.key(0), feats)
    # train+forced runs chain f32 / MLP bf16 — identical computation to
    # eval with chain_bf16=False (chain f32 / MLP bf16)
    np.testing.assert_array_equal(
        np.array(forced.apply(v, feats, train=True)),
        np.array(plain.apply(v, feats, train=False)))
    # without the flag the train chain follows dtype=bf16 and diverges
    out_bf16 = np.array(plain.apply(v, feats, train=True))
    assert np.abs(
        out_bf16 - np.array(forced.apply(v, feats, train=True))).max() > 0


def test_router_flat_chain_equals_plane():
    """chain_impl="flat" runs the identical math on the [T, C*P] layout
    (nine masked flat shifts == the planar 3x3, same taps in the same
    order; LN over the same element set — only the reduction tree
    differs, so equality is float-tolerance, measured 7e-7): outputs and
    gradients match in both train and eval."""
    kw = dict(num_anchors=32, channels=16, points=12)
    plane = AdaptiveRouter(**kw)
    flat = AdaptiveRouter(chain_impl="flat", **kw)
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(2, 32, 16, 12)).astype(np.float32))
    v = plane.init(jax.random.key(0), feats)
    for train in (False, True):
        np.testing.assert_allclose(
            np.array(plane.apply(v, feats, train=train)),
            np.array(flat.apply(v, feats, train=train)),
            rtol=1e-5, atol=1e-5)

    def loss(params, mod):
        return (mod.apply({"params": params}, feats, train=True)
                * jnp.arange(64, dtype=jnp.float32).reshape(2, 32, 1)).sum()

    gp = jax.grad(loss)(v["params"], plane)
    gf = jax.grad(loss)(v["params"], flat)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gf)):
        a, b = np.array(a), np.array(b)
        # absolute bound: backward amplifies the ~1e-6 forward
        # reduction-tree diffs, and the conv_bias grads are mathematically
        # ZERO (every conv output feeds a shift-invariant LayerNorm), so
        # their computed values are pure cancellation noise in BOTH
        # implementations (measured ~1e-4 in each)
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=0)


def test_router_gradients_flow():
    router = AdaptiveRouter(num_anchors=32, channels=16, points=12)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(1, 32, 16, 12)).astype(np.float32))
    v = router.init(jax.random.key(0), feats)

    def loss(params):
        return router.apply({"params": params}, feats, train=True).sum()

    g = jax.grad(loss)(v["params"])
    norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
    assert sum(norms) > 0


def test_banded_conv_matches_shifted_taps():
    """banded_taps/_conv3x3_banded == _conv3x3 (the kept-as-negative-result
    MXU formulation must stay numerically honest)."""
    import numpy as np
    import jax.numpy as jnp
    from phnet_tpu.ops.router_pallas import (
        _conv3x3, _conv3x3_banded, banded_taps,
    )

    rng = np.random.default_rng(0)
    t, c, p = 6, 5, 7
    x = jnp.asarray(rng.normal(size=(t, c, p)).astype(np.float32))
    taps = jnp.asarray(rng.normal(size=(t, 9)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(t,)).astype(np.float32))
    a = _conv3x3(x, taps, bias)
    b = _conv3x3_banded(x, banded_taps(taps, p), bias)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
