"""MSDeformAttn parity vs the reference's torch fallback.

``ms_deform_attn_core_pytorch``
(``/root/reference/libs/models/SeqFormer/ops/functions/ms_deform_attn_func.py:42-64``)
is the reference's own CUDA-free oracle ("for debug and test only") —
exactly the right target for the TPU core op. The module test checks the
characteristic init (directional offset bias, zero attention weights)
and gradient flow.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.ops.ms_deform_attn import ms_deform_attn
from phnet_tpu.models.deform_attn import MSDeformAttn, _offset_bias_init

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_core():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the functions module imports the CUDA extension at top level; the
    # fallback itself never touches it
    sys.modules.setdefault(
        "MultiScaleDeformableAttention", types.ModuleType(
            "MultiScaleDeformableAttention"))
    from libs.models.SeqFormer.ops.functions.ms_deform_attn_func import (
        ms_deform_attn_core_pytorch,
    )
    return torch, ms_deform_attn_core_pytorch


SHAPES = ((12, 16), (6, 8), (3, 4))


def _problem(seed, n=2, lq=7, m=4, d=8, p=3):
    rng = np.random.default_rng(seed)
    s = sum(h * w for h, w in SHAPES)
    nl = len(SHAPES)
    value = rng.normal(size=(n, s, m, d)).astype(np.float32)
    # mostly interior, some deliberately out of bounds
    locs = rng.uniform(-0.2, 1.2, size=(n, lq, m, nl, p, 2)).astype(np.float32)
    w = rng.uniform(size=(n, lq, m, nl * p)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(n, lq, m, nl, p)
    return value, locs, w


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_core_matches_reference_fallback(ref_core, seed):
    torch, core = ref_core
    value, locs, w = _problem(seed)

    ours = np.asarray(jax.jit(
        lambda v, l, a: ms_deform_attn(v, SHAPES, l, a))(value, locs, w))

    theirs = core(
        torch.from_numpy(value),
        torch.as_tensor(np.asarray(SHAPES, np.int64)),
        torch.from_numpy(locs),
        torch.from_numpy(w),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_core_zero_outside(ref_core):
    """Every sampling point far out of bounds -> exact zeros."""
    value, locs, w = _problem(3)
    locs = locs + 10.0
    ours = np.asarray(ms_deform_attn(value, SHAPES, locs, w))
    np.testing.assert_array_equal(ours, np.zeros_like(ours))


def test_module_init_and_grad():
    c, m, nl, p = 32, 4, len(SHAPES), 2
    mod = MSDeformAttn(d_model=c, n_levels=nl, n_heads=m, n_points=p)
    rng = np.random.default_rng(0)
    n, nf, lq = 1, 2, 5
    s = sum(h * w for h, w in SHAPES)
    q = jnp.asarray(rng.normal(size=(n, nf, lq, c)), jnp.float32)
    refp = jnp.asarray(rng.uniform(0.2, 0.8, size=(n, nf, lq, nl, 2)),
                       jnp.float32)
    feats = jnp.asarray(rng.normal(size=(n, nf, s, c)), jnp.float32)

    variables = mod.init(jax.random.key(0), q, refp, feats, SHAPES)
    params = variables["params"]
    # characteristic init (ms_deform_attn.py:66-81)
    np.testing.assert_array_equal(
        params["sampling_offsets"]["kernel"], 0.0)
    np.testing.assert_allclose(
        params["sampling_offsets"]["bias"], _offset_bias_init(m, nl, p),
        rtol=1e-6)
    np.testing.assert_array_equal(params["attention_weights"]["kernel"], 0.0)
    np.testing.assert_array_equal(params["attention_weights"]["bias"], 0.0)

    out = mod.apply(variables, q, refp, feats, SHAPES)
    assert out.shape == (n, nf, lq, c)
    assert np.isfinite(np.asarray(out)).all()

    # zero-init attention => uniform softmax; with zero offsets the op
    # reduces to a bilinear-sampled average — nonzero and differentiable
    def loss(p_):
        return mod.apply({"params": p_}, q, refp, feats, SHAPES).sum()

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0.0

    # padding mask zeroes padded positions' contribution
    mask = jnp.ones((n, nf, s), bool)
    out_masked = mod.apply(variables, q, refp, feats, SHAPES,
                           input_padding_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_masked),
        np.broadcast_to(
            np.asarray(params["output_proj"]["bias"]), out_masked.shape),
        atol=1e-6)
