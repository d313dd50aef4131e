"""Pallas weight-dequantizing matmul vs the XLA w8 reference.

Runs in Pallas interpret mode on CPU. The kernel is a documented
measured-negative on v5e (see ops/w8_pallas.py STATUS) kept honest for
future A/Bs; this test pins its numerics to ``w8_matmul_prequant``
(same bf16 multiplicands / f32 accumulation — only K-block partial-sum
reassociation may differ).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from phnet_tpu.ops.quant import quantize_colwise, w8_matmul_prequant
from phnet_tpu.ops.w8_pallas import w8_matmul_pallas


@pytest.mark.parametrize(
    "m,k,n",
    [
        (240, 1024, 512),  # real-geometry block multiples (K-split path)
        (7, 300, 60),      # every axis padded
        (16, 512, 512),    # exact single block
        (100, 100, 100),   # sub-block everywhere
    ],
)
def test_matches_xla_w8(m, k, n):
    rng = np.random.default_rng(m * 1000 + n)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    wq, sw = quantize_colwise(w)
    ref = np.asarray(w8_matmul_prequant(x, wq, sw))
    got = np.asarray(w8_matmul_pallas(x, wq, sw, interpret=True))
    scale = np.max(np.abs(ref)) + 1e-9
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-6)


def test_leading_dims_flatten():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    wq, sw = quantize_colwise(w)
    ref = np.asarray(w8_matmul_prequant(x, wq, sw))
    got = np.asarray(w8_matmul_pallas(x, wq, sw, interpret=True))
    assert got.shape == (2, 3, 32)
    np.testing.assert_allclose(got, ref, atol=1e-4)
