"""Pallas NMS kernel vs the pure-JAX reference implementation.

Runs in Pallas interpret mode on CPU (the compiled path is exercised on
real TPU by the verify drives / bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from phnet_tpu.ops import lane_nms
from phnet_tpu.ops.nms_pallas import lane_nms_pallas


def make_problem(seed, a=240, n_offsets=36):
    rng = np.random.default_rng(seed)
    proposals = np.zeros((a, 5 + n_offsets), dtype=np.float32)
    proposals[:, 2] = rng.uniform(0, 0.6, a)
    proposals[:, 4] = rng.uniform(0, 40, a)
    base = rng.uniform(0, 700, (a, 1))
    proposals[:, 5:] = base + rng.normal(0, 40, (a, n_offsets))
    scores = rng.uniform(0, 1, a).astype(np.float32)
    valid = scores >= 0.3
    return proposals, scores, valid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_pure_jax(seed):
    n_offsets, top_k = 36, 8
    proposals, scores, valid = make_problem(seed, n_offsets=n_offsets)
    ref = lane_nms(jnp.array(proposals), jnp.array(scores), jnp.array(valid),
                   50.0, n_offsets=n_offsets, top_k=top_k)
    out = lane_nms_pallas(jnp.array(proposals), jnp.array(scores),
                          jnp.array(valid), 50.0, n_offsets=n_offsets,
                          top_k=top_k, interpret=True)
    np.testing.assert_array_equal(np.array(ref[0]), np.array(out[0]))
    assert int(ref[1]) == int(out[1])
    np.testing.assert_array_equal(np.array(ref[2]), np.array(out[2]))


def test_pallas_all_invalid():
    proposals, scores, _ = make_problem(5)
    out = lane_nms_pallas(jnp.array(proposals), jnp.array(scores),
                          jnp.zeros(240, bool), 50.0, n_offsets=36, top_k=8,
                          interpret=True)
    assert int(out[1]) == 0
    assert np.all(np.array(out[0]) == -1)
