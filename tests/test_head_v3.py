"""Router4OLV3 port: cross-frame prior propagation (PropagatingLaneHead).

Reference semantics under test (``/root/reference/libs/models/Router4OLV3.py``):

* predictions carry A regular + K propagated rows (``:342-353``);
* frame t-1's kept lanes return as frame t's extra priors, decoded from
  their memorized features by dedicated "_last" heads (``:294-367``);
* one-frame memory window, no mean-negative row (``saveMemory``,
  ``:729-741``);
* invalid propagated slots behave like absent rows (fixed-shape dead-row
  design, see ``models/head_v3.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.config import (
    BackboneConfig, HeadConfig, LaneSpec, LossConfig, MemoryConfig,
    ModelConfig, NeckConfig, TestParams, openlane_propagate_config,
)
from phnet_tpu.models import PHNet
from phnet_tpu.models.phnet import V3MemoryState, init_memory


def v3_cfg(conf_threshold=0.0):
    return ModelConfig(
        img_h=96,
        img_w=192,
        lane=LaneSpec(n_offsets=12, n_lengths=1),
        backbone=BackboneConfig(in_channels=(8, 16, 24, 32)),
        neck=NeckConfig(in_channels=(16, 24, 32), out_channels=16, num_outs=3),
        head=HeadConfig(
            num_priors=32, sample_points=8, fc_hidden_dim=16,
            prior_feat_channels=16, decoder_ffn_dim=32,
            separate_offset_head=True, pos_encoding="learned",
            propagate_priors=True,
        ),
        memory=MemoryConfig(window=1, slots_per_frame=4),
        test=TestParams(conf_threshold=conf_threshold, nms_thres=20.0,
                        nms_topk=4),
        max_lanes=4,
        routing="soft",
    )


def make_labels(rng, b, t, cfg, n_valid=2):
    spec = cfg.lane
    lab = np.full((b, t, cfg.max_lanes, spec.dim), -1e5, np.float32)
    lab[..., 0] = 1.0
    lab[..., 1] = 0.0
    for i in range(n_valid):
        lab[:, :, i, :2] = (0.0, 1.0)
        lab[:, :, i, 2:5] = (0.0, 0.25 + 0.3 * i, 0.5)
        lab[:, :, i, spec.col_length] = 0.8
        lab[:, :, i, spec.col_xs:] = np.sort(
            rng.uniform(20, 170, (b, t, spec.n_offsets)), axis=-1)
    return jnp.asarray(lab)


@pytest.fixture(scope="module")
def setup():
    cfg = v3_cfg()
    model = PHNet(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(1, 3, cfg.img_h, cfg.img_w, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        frames, None, train=False)
    return cfg, model, frames, variables, rng


def test_inference_shapes_and_carry(setup):
    cfg, model, frames, variables, _ = setup
    outs, mem = model.apply(variables, frames, None, train=False)
    t, b = 3, 1
    assert outs.kept.shape == (t, b, cfg.test.nms_topk, cfg.lane.dim)
    assert isinstance(mem, V3MemoryState)
    k = cfg.max_lanes
    assert mem.feat.shape == (b, cfg.head.refine_layers, k, cfg.head.attn_dim)
    assert mem.priors.shape == (b, k, cfg.lane.dim)
    # conf 0.0 -> everything above threshold -> slots fill up
    assert np.array(mem.mask).any()
    assert bool(jnp.isfinite(mem.priors).all())
    assert int(mem.t) == t


def test_dead_rows_never_kept(setup):
    """With an empty carry, the K propagated rows are dead: pinned cls
    [20,-20] can never pass a real confidence threshold, and NMS never
    returns their indices on the first frame."""
    cfg, model, frames, variables, _ = setup
    outs, _ = model.apply(variables, frames[:, :1], None, train=False)
    a = cfg.head.num_priors
    keep0 = np.array(outs.kept[0])  # [B, K, dim] routed rows
    # kept rows' scores: the dead rows would show logits ~[20, -20]
    assert not np.any((keep0[..., 0] > 15) & (keep0[..., 1] < -15))
    # single-frame detect exposes keeps only via kept vectors; also check
    # via the head directly that dead rows carry the pinned logits
    from phnet_tpu.models.head_v3 import PropagatingLaneHead

    head = PropagatingLaneHead(cfg, name="head")
    k = cfg.max_lanes
    feats = model.apply(variables, frames[:, :1], train=False,
                        method=PHNet.encode)
    frame_feats = tuple(f[0] for f in feats)  # [B, h, w, c]
    hv = {"params": variables["params"]["frame"]["head"],
          "batch_stats": variables.get("batch_stats", {})}
    mem0 = init_memory(cfg, 1, 1)
    out = head.apply(
        {"params": variables["params"]["frame"]["head"]},
        frame_feats, mem0.feat, mem0.priors, mem0.mask, False)
    pf = np.array(out.pred_fir)  # [S, B, A+K, dim]
    assert pf.shape[2] == a + k
    np.testing.assert_allclose(pf[:, :, a:, 0], 20.0)
    np.testing.assert_allclose(pf[:, :, a:, 1], -20.0)
    # dead xs parked far off-image
    assert np.all(pf[:, :, a:, cfg.lane.col_xs:] < -1.0)


def test_propagation_changes_later_frames(setup):
    """Frame 2's propagated rows must reflect frame 1's keeps (carry in
    action): running frame 2 with the real carry vs an empty carry gives
    different propagated-row predictions."""
    cfg, model, frames, variables, _ = setup
    _, mem1 = model.apply(variables, frames[:, :1], None, train=False)
    assert np.array(mem1.mask).any()

    outs_carry, _ = model.apply(variables, frames[:, 1:2], None,
                                train=False, initial_memory=mem1)
    outs_fresh, _ = model.apply(variables, frames[:, 1:2], None,
                                train=False)
    assert not np.allclose(np.array(outs_carry.kept),
                           np.array(outs_fresh.kept))


def test_train_loss_and_grads(setup):
    cfg, model, frames, variables, rng = setup
    from phnet_tpu.losses import LaneCriterion

    labels = make_labels(rng, 1, 3, cfg)
    crit = LaneCriterion(cfg, LossConfig(style="blend_cls",
                                         use_lane_iou=True))

    def loss_fn(params):
        (touts, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            frames, labels, train=True,
            rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"])
        loss, _ = crit(touts, labels)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    # the dedicated _last heads and decoder receive gradient once memory
    # carries rows (frames 2-3)
    head_params = grads["frame"]["head"]
    for name in ("heads_fir_last", "heads_sec_last",
                 "temporal_decoder_last", "mlp_router_0"):
        sub = jax.tree_util.tree_leaves(head_params[name])
        assert any(float(jnp.abs(g).max()) > 0 for g in sub), name


def test_propagate_preset_builds():
    cfg = openlane_propagate_config()
    assert cfg.model.head.propagate_priors
    assert cfg.model.memory.window == 1
    assert cfg.model.lane.n_lengths == 1
    mem = init_memory(cfg.model, 2, 1)
    assert isinstance(mem, V3MemoryState)
    assert mem.feat.shape == (2, 3, 4, cfg.model.head.attn_dim)


def test_decoder_tgt_mask_blocks_dead_rows():
    """Self-attention over the K propagated rows must exclude dead
    (invalid) slots as keys: a valid row's decode cannot change with the
    CONTENT of masked-out rows. Reference semantics: forward_second_last
    self-attends only over the real ragged kept rows
    (Router4OLV3.py:521-524)."""
    from phnet_tpu.models.transformer import TemporalDecoder

    d, k, a = 16, 4, 6
    dec = TemporalDecoder(dim=d, num_layers=1, num_heads=4, ffn_dim=32,
                          dropout=0.0)
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.normal(size=(1, k, d)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(1, a, d)).astype(np.float32))
    mem_mask = jnp.ones((1, a), bool)
    tgt_mask = jnp.array([[True, True, False, False]])

    variables = dec.init(jax.random.key(0), tgt, mem, mem_mask,
                         tgt_mask=tgt_mask)
    out_a = dec.apply(variables, tgt, mem, mem_mask, tgt_mask=tgt_mask)
    # garbage in the dead rows must not reach the valid rows
    tgt_b = tgt.at[:, 2:].set(1e3)
    out_b = dec.apply(variables, tgt_b, mem, mem_mask, tgt_mask=tgt_mask)
    np.testing.assert_allclose(np.array(out_a[:, :2]),
                               np.array(out_b[:, :2]), atol=1e-5)
    # without the mask the same perturbation leaks (sanity: test has teeth)
    out_c = dec.apply(variables, tgt, mem, mem_mask)
    out_d = dec.apply(variables, tgt_b, mem, mem_mask)
    assert np.abs(np.array(out_c[:, :2]) - np.array(out_d[:, :2])).max() > 1e-3


def test_propagating_head_out_dims_match_base():
    """The _last head stacks must emit the same (cls, geo[, offsets])
    widths as the base branches — one source of truth."""
    from phnet_tpu.models.head_v3 import PropagatingLaneHead

    cfg = openlane_propagate_config().model
    head = PropagatingLaneHead(cfg)
    b, hh, ww = 1, cfg.img_h, cfg.img_w
    feats = tuple(
        jnp.zeros((b, hh // s, ww // s, cfg.head.prior_feat_channels))
        for s in (8, 16, 32))
    k = cfg.max_lanes
    variables = head.init(
        jax.random.key(0), feats,
        jnp.zeros((b, cfg.head.refine_layers, k, cfg.head.attn_dim)),
        jnp.zeros((b, k, cfg.lane.dim)),
        jnp.zeros((b, k), bool))
    out = head.apply(variables, feats,
                     jnp.zeros((b, cfg.head.refine_layers, k, cfg.head.attn_dim)),
                     jnp.zeros((b, k, cfg.lane.dim)),
                     jnp.zeros((b, k), bool))
    assert out.pred_fir.shape[-1] == cfg.lane.dim
    assert out.pred_sec.shape[-1] == cfg.lane.dim
