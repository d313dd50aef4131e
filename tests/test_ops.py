"""Unit tests for phnet_tpu.ops: NMS, bilinear sampling, Hungarian.

Each op is checked against an independent slow oracle:
 * NMS      vs a direct numpy transcription of the reference CUDA semantics
             (libs/ops/csrc/nms_kernel.cu devIoU + greedy collect)
 * sampler  vs torch.nn.functional.grid_sample(align_corners=True)
 * hungarian vs scipy.optimize.linear_sum_assignment
"""

import numpy as np
import pytest

import jax.numpy as jnp

from phnet_tpu.config import LaneSpec
from phnet_tpu.ops import (
    bilinear_sample,
    hungarian_assign,
    lane_nms,
    nms_proposals_from_predictions,
)
from phnet_tpu.ops.sampler import pool_prior_features


# ---------------------------------------------------------------------------
# NMS oracle: straight numpy port of the reference CUDA kernel's semantics.
# ---------------------------------------------------------------------------
def _dev_iou_suppress(a, b, thresh, n_offsets):
    n_strips = n_offsets - 1
    start_a = int(a[2] * n_strips + 0.5)
    start_b = int(b[2] * n_strips + 0.5)
    start = max(start_a, start_b)
    end_a = int(start_a + a[4] - 1 + 0.5 - ((a[4] - 1) < 0))
    end_b = int(start_b + b[4] - 1 + 0.5 - ((b[4] - 1) < 0))
    end = min(min(end_a, end_b), n_offsets - 1)
    if end < start:
        return False
    dist = float(np.abs(a[5 + start : 5 + end + 1] - b[5 + start : 5 + end + 1]).sum())
    return dist < thresh * (end - start + 1)


def _nms_oracle(proposals, scores, valid, thresh, n_offsets, top_k):
    order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
    order = [i for i in order if valid[i]]
    keep = []
    for i in order:
        if len(keep) >= top_k:
            break
        if any(_dev_iou_suppress(proposals[k], proposals[i], thresh, n_offsets) for k in keep):
            continue
        keep.append(i)
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_lane_nms_matches_reference_semantics(seed):
    rng = np.random.default_rng(seed)
    n_offsets, a, top_k = 36, 64, 8
    proposals = np.zeros((a, 5 + n_offsets), dtype=np.float32)
    proposals[:, 2] = rng.uniform(0, 0.6, a)  # start_y
    proposals[:, 4] = rng.uniform(0, 40, a)  # length in strips
    base = rng.uniform(0, 700, (a, 1))
    proposals[:, 5:] = base + rng.normal(0, 40, (a, n_offsets))
    scores = rng.uniform(0, 1, a).astype(np.float32)
    valid = scores >= 0.3

    keep_idx, num_kept, keep_mask = lane_nms(
        jnp.array(proposals), jnp.array(scores), jnp.array(valid),
        thresh=50.0, n_offsets=n_offsets, top_k=top_k,
    )
    expected = _nms_oracle(proposals, scores, valid, 50.0, n_offsets, top_k)
    got = [int(i) for i in np.array(keep_idx) if i >= 0]
    assert got == expected
    assert int(num_kept) == len(expected)
    assert sorted(np.nonzero(np.array(keep_mask))[0].tolist()) == sorted(expected)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_lane_nms_short_lengths(seed):
    """Degenerate proposals with length < 1 strip: the CUDA kernel
    truncates `start + len - 1 + 0.5 - (len-1<0)` as ONE expression
    (nms_kernel.cu:32); per-part truncation is off by one exactly here."""
    rng = np.random.default_rng(seed)
    n_offsets, a, top_k = 36, 32, 8
    proposals = np.zeros((a, 5 + n_offsets), dtype=np.float32)
    proposals[:, 2] = rng.uniform(0, 0.6, a)
    proposals[:, 4] = rng.uniform(0.0, 2.0, a)  # mostly sub-strip lengths
    base = rng.uniform(0, 700, (a, 1))
    proposals[:, 5:] = base + rng.normal(0, 10, (a, n_offsets))
    scores = rng.uniform(0, 1, a).astype(np.float32)
    valid = scores >= 0.2

    keep_idx, num_kept, _ = lane_nms(
        jnp.array(proposals), jnp.array(scores), jnp.array(valid),
        thresh=15.0, n_offsets=n_offsets, top_k=top_k,
    )
    expected = _nms_oracle(proposals, scores, valid, 15.0, n_offsets, top_k)
    got = [int(i) for i in np.array(keep_idx) if i >= 0]
    assert got == expected
    assert int(num_kept) == len(expected)


def test_lane_nms_no_valid():
    n_offsets, a = 36, 16
    proposals = jnp.zeros((a, 5 + n_offsets))
    keep_idx, num_kept, keep_mask = lane_nms(
        proposals, jnp.zeros((a,)), jnp.zeros((a,), bool),
        thresh=50.0, n_offsets=n_offsets, top_k=4,
    )
    assert int(num_kept) == 0
    assert np.all(np.array(keep_idx) == -1)
    assert not np.any(np.array(keep_mask))


def test_nms_proposals_layout():
    spec = LaneSpec(n_offsets=36, n_lengths=2)
    pred = np.zeros((3, spec.dim), dtype=np.float32)
    pred[:, spec.col_start_y] = 0.1
    pred[:, spec.col_start_x] = 0.5
    pred[:, spec.col_length] = 0.4
    pred[:, spec.col_xs :] = 0.25
    out = np.array(nms_proposals_from_predictions(jnp.array(pred), spec, img_w=768))
    assert out.shape == (3, 5 + 36)
    np.testing.assert_allclose(out[:, 3], 0.5 * 767, rtol=1e-6)
    np.testing.assert_allclose(out[:, 4], 0.4 * 35, rtol=1e-6)
    np.testing.assert_allclose(out[:, 5:], 0.25 * 767, rtol=1e-6)


# ---------------------------------------------------------------------------
# Bilinear sampler vs torch grid_sample
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 1])
def test_bilinear_sample_matches_grid_sample(seed):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(seed)
    c, h, w = 8, 12, 24
    feat = rng.normal(size=(c, h, w)).astype(np.float32)
    # normalized coords, include out-of-range to exercise zero padding
    gx = rng.uniform(-1.3, 1.3, size=(5, 7)).astype(np.float32)
    gy = rng.uniform(-1.3, 1.3, size=(5, 7)).astype(np.float32)

    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))[None]
    ref = F.grid_sample(
        torch.from_numpy(feat)[None], grid, align_corners=True, mode="bilinear"
    )[0].numpy()  # [C, 5, 7]

    px = (gx + 1) / 2 * (w - 1)
    py = (gy + 1) / 2 * (h - 1)
    out = np.array(bilinear_sample(jnp.array(feat), jnp.array(px), jnp.array(py)))
    np.testing.assert_allclose(np.moveaxis(ref, 0, -1), out, atol=1e-5)


def test_pool_prior_features_shape():
    feat = jnp.ones((64, 48, 96))
    prior_xs = jnp.linspace(0, 1, 36)[None, :].repeat(240, axis=0)
    prior_feat_ys = jnp.linspace(0, 1, 36)
    out = pool_prior_features(feat, prior_xs, prior_feat_ys)
    assert out.shape == (240, 36, 64)
    np.testing.assert_allclose(np.array(out), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# Hungarian vs scipy
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", list(range(8)))
@pytest.mark.parametrize("r,c", [(1, 240), (4, 240), (8, 240), (8, 17)])
def test_hungarian_matches_scipy(seed, r, c):
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(seed * 100 + r)
    cost = rng.normal(size=(r, c)).astype(np.float32) * 10
    col4row = np.array(hungarian_assign(jnp.array(cost), jnp.ones((r,), bool)))
    rows, cols = linear_sum_assignment(cost)
    ours = cost[np.arange(r), col4row].sum()
    theirs = cost[rows, cols].sum()
    assert len(set(col4row.tolist())) == r  # distinct columns
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_hungarian_partial_valid():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(7)
    r, c, nv = 8, 40, 3
    cost = rng.normal(size=(r, c)).astype(np.float32)
    valid = np.zeros((r,), bool)
    valid[:nv] = True
    col4row = np.array(hungarian_assign(jnp.array(cost), jnp.array(valid)))
    rows, cols = linear_sum_assignment(cost[:nv])
    ours = cost[np.arange(nv), col4row[:nv]].sum()
    np.testing.assert_allclose(ours, cost[rows, cols].sum(), rtol=1e-5)
    assert len(set(col4row.tolist())) == r


class TestMaxPoolVJP:
    """ops/pool.py: equality-routed max-pool backward == XLA's
    select-and-scatter VJP wherever window maxima are unique, with the
    documented tie-split divergence."""

    def _grads(self, x, fn):
        import jax

        def loss(x):
            y = fn(x)
            # position-dependent weights make routing errors visible
            w = jnp.arange(y.size, dtype=y.dtype).reshape(y.shape)
            return (y * w).sum()

        return np.array(jax.grad(loss)(x))

    @pytest.mark.parametrize("shape", [(2, 8, 12, 3), (1, 9, 7, 4),
                                       (1, 48, 96, 8)])
    def test_matches_select_and_scatter_on_distinct(self, shape):
        import flax.linen as nn

        from phnet_tpu.ops.pool import max_pool_3x3_s2

        rng = np.random.default_rng(0)
        # distinct values => unique window maxima => routing must be equal
        x = rng.permutation(np.arange(np.prod(shape), dtype=np.float32))
        x = jnp.asarray(x.reshape(shape))
        ref_fn = lambda t: nn.max_pool(  # noqa: E731
            t, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        np.testing.assert_array_equal(
            np.array(max_pool_3x3_s2(x)), np.array(ref_fn(x)))
        np.testing.assert_allclose(
            self._grads(x, max_pool_3x3_s2), self._grads(x, ref_fn),
            atol=1e-5)

    def test_tie_split(self):
        from phnet_tpu.ops.pool import max_pool_3x3_s2

        # all-equal input: every window is fully tied; the split keeps
        # total gradient mass conserved (sum dx == sum upstream weights)
        x = jnp.zeros((1, 4, 4, 1), jnp.float32)
        g = self._grads(x, max_pool_3x3_s2)
        assert np.isclose(g.sum(), 0 + 1 + 2 + 3), g.sum()

    def test_bf16(self):
        from phnet_tpu.ops.pool import max_pool_3x3_s2

        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.permutation(np.arange(2 * 8 * 8 * 4, dtype=np.float32))
            .reshape(2, 8, 8, 4)).astype(jnp.bfloat16)
        y = max_pool_3x3_s2(x)
        assert y.dtype == jnp.bfloat16
        g = self._grads(x, max_pool_3x3_s2)
        assert np.isfinite(g.astype(np.float32)).all()
