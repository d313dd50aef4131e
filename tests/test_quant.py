"""Dynamic int8 quantization (ops/quant.py + DynamicConv wiring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.models import PHNet
from phnet_tpu.models.dynamic_conv import DynamicConv
from phnet_tpu.ops.quant import (
    int8_affine, int8_matmul, quantize_colwise, quantize_rowwise,
)

from test_model import tiny_cfg


def test_quantize_roundtrip_bounds():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 96)).astype(np.float32))
    q, s = quantize_rowwise(x)
    assert q.dtype == jnp.int8 and s.shape == (32, 1)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    # absmax symmetric: per-row error bounded by scale/2
    assert (err <= np.asarray(s) / 2 + 1e-7).all()

    w = jnp.asarray(rng.normal(size=(96, 48)).astype(np.float32))
    qw, sw = quantize_colwise(w)
    assert qw.dtype == jnp.int8 and sw.shape == (48,)
    err = np.abs(np.asarray(qw, np.float32) * np.asarray(sw) - np.asarray(w))
    assert (err <= np.asarray(sw)[None, :] / 2 + 1e-7).all()


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 240, 512)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    ref = np.asarray(x @ w + b)
    out = np.asarray(jax.jit(int8_affine)(x, w, b))
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 1.5e-2, rel
    # int32 accumulation: no overflow even for adversarial +-127 rows
    x2 = jnp.ones((1, 8192)) * 10.0
    w2 = jnp.ones((8192, 4)) * 10.0
    out2 = np.asarray(int8_matmul(x2, w2))
    np.testing.assert_allclose(out2, np.full((1, 4), 8192 * 100.0), rtol=1e-6)


@pytest.mark.parametrize("mode", ["int8", "w8"])
def test_quantized_dynamic_conv_close(mode):
    """Same params, quantize on/off: outputs stay close (the LayerNorms
    after each chain renormalize the quantization error). w8 rounds only
    the weights, so its error must be at least as tight as w8a8's."""
    rng = np.random.default_rng(2)
    pro = jnp.asarray(rng.normal(size=(1, 16, 24)).astype(np.float32))
    roi = jnp.asarray(rng.normal(size=(1, 16, 8, 24)).astype(np.float32))
    kw = dict(feat_size=8, hidden_dim=24, param_reduction=2)
    m_f32 = DynamicConv(**kw)
    m_q = DynamicConv(quantize=mode, **kw)
    variables = m_f32.init(jax.random.key(0), pro, roi)
    a = np.asarray(m_f32.apply(variables, pro, roi))
    b = np.asarray(m_q.apply(variables, pro, roi))
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < (0.05 if mode == "int8" else 0.03), rel


def test_w8_matmul_close_to_f32():
    from phnet_tpu.ops.quant import w8_matmul_prequant

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 240, 512)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
    wq, sw = quantize_colwise(w)
    ref = np.asarray(x @ w)
    out = np.asarray(jax.jit(w8_matmul_prequant)(x, wq, sw))
    assert out.shape == ref.shape and out.dtype == np.float32
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    # weights-only rounding + bf16 activations: tighter than w8a8
    assert rel < 1e-2, rel


@pytest.mark.parametrize("mode", ["int8", "w8"])
def test_quantized_hoisted_weights_match_inline(mode):
    """combined_weights() pre-quantizes every chain outside the scan; the
    hoisted path must equal the inline (in-scan) quantization exactly —
    same colwise absmax, same int8 kernel."""
    rng = np.random.default_rng(3)
    pro = jnp.asarray(rng.normal(size=(1, 16, 24)).astype(np.float32))
    roi = jnp.asarray(rng.normal(size=(1, 16, 8, 24)).astype(np.float32))
    m = DynamicConv(feat_size=8, hidden_dim=24, param_reduction=2,
                    quantize=mode)
    variables = m.init(jax.random.key(0), pro, roi)
    cw = m.apply(variables, method=DynamicConv.combined_weights)
    assert set(cw) == {"gen1", "gen2", "out"}
    for entry in cw.values():
        qk = entry.get("wq", entry.get("wq1"))
        assert qk.dtype == jnp.int8
    a = np.asarray(m.apply(variables, pro, roi))            # inline
    b = np.asarray(m.apply(variables, pro, roi, combined=cw))  # hoisted
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["int8", "w8"])
def test_quantized_model_inference_and_train_guard(mode):
    import dataclasses

    mcfg = dataclasses.replace(tiny_cfg(window=4), quantize=mode)
    model = PHNet(mcfg)
    frames = jnp.zeros((1, 2, mcfg.img_h, mcfg.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames)
    outs, mem = model.apply(variables, frames, None, train=False)
    assert np.asarray(outs.num_kept).shape == (2, 1)

    labels = jnp.full((1, 2, mcfg.max_lanes, mcfg.lane.dim), -1e5)
    with pytest.raises(ValueError, match="inference-only"):
        model.apply(variables, frames, labels, train=True,
                    rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
