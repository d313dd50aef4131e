"""Model forward tests (tiny config, CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.config import (
    BackboneConfig, HeadConfig, LaneSpec, MemoryConfig, ModelConfig,
    NeckConfig, TestParams,
)
from phnet_tpu.models import PHNet
from phnet_tpu.models.phnet import init_memory, route_predictions


def tiny_cfg(routing="hard", n_lengths=2, window=0, separate_offset_head=False):
    return ModelConfig(
        img_h=96,
        img_w=192,
        lane=LaneSpec(n_offsets=12, n_lengths=n_lengths),
        backbone=BackboneConfig(in_channels=(8, 16, 24, 32)),
        neck=NeckConfig(in_channels=(16, 24, 32), out_channels=16, num_outs=3),
        head=HeadConfig(
            num_priors=32,
            sample_points=8,
            fc_hidden_dim=16,
            prior_feat_channels=16,
            decoder_ffn_dim=32,
            separate_offset_head=separate_offset_head,
            pos_encoding="sine" if n_lengths == 2 else "learned",
        ),
        memory=MemoryConfig(window=window, slots_per_frame=5),
        test=TestParams(conf_threshold=0.3, nms_thres=20.0, nms_topk=4),
        max_lanes=4,
        routing=routing,
    )


def make_labels(rng, b, t, cfg):
    spec = cfg.lane
    lab = np.full((b, t, cfg.max_lanes, spec.dim), -1e5, np.float32)
    lab[..., 0] = 1.0
    lab[..., 1] = 0.0
    # two valid lanes per frame
    for i in range(2):
        lab[:, :, i, 0] = 0.0
        lab[:, :, i, 1] = 1.0
        lab[:, :, i, 2] = 0.0
        lab[:, :, i, 3] = 0.3 + 0.3 * i
        lab[:, :, i, 4] = 0.5
        lab[:, :, i, spec.col_length] = 0.8
        if spec.n_lengths == 2:
            lab[:, :, i, spec.col_invalid_length] = 0.0
        lab[:, :, i, spec.col_xs:] = rng.uniform(
            20, 170, (b, t, spec.n_offsets))
    return jnp.array(lab)


@pytest.mark.parametrize("n_lengths,sep", [(2, False), (1, True)])
def test_phnet_train_forward(n_lengths, sep):
    cfg = tiny_cfg(n_lengths=n_lengths, separate_offset_head=sep)
    model = PHNet(cfg)
    rng = np.random.default_rng(0)
    b, t = 1, 3
    frames = jnp.array(rng.normal(size=(b, t, cfg.img_h, cfg.img_w, 3)), jnp.float32)
    labels = make_labels(rng, b, t, cfg)

    variables = jax.jit(lambda r, f, l: model.init(r, f, l, train=True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        frames, labels,
    )
    outs, mem = jax.jit(
        lambda v, f, l, r: model.apply(
            v, f, l, train=True, rngs={"dropout": r}, mutable=["batch_stats"]
        )
    )(variables, frames, labels, jax.random.key(2))[0]
    s, a, dim = 3, cfg.head.num_priors, cfg.lane.dim
    assert outs.pred_fir.shape == (t, s, b, a, dim)
    assert outs.pred_sec.shape == (t, s, b, a, dim)
    assert outs.diff.shape == (t, s, b, a)
    assert np.all(np.isfinite(np.array(outs.pred_fir)))
    assert np.all(np.isfinite(np.array(outs.pred_sec)))
    # router scores land in [0.5, 1) because its MLP ends in ReLU
    d = np.array(outs.diff)
    assert d.min() >= 0.5 and d.max() < 1.0
    # training memory fills one slot row per frame
    assert mem.mask.shape == (b, t, cfg.max_lanes + 1)
    assert bool(mem.mask[:, :, -1].all())
    assert int(mem.t) == t


def test_phnet_infer_forward_and_memory():
    cfg = tiny_cfg(window=2)
    model = PHNet(cfg)
    rng = np.random.default_rng(1)
    b, t = 2, 4
    frames = jnp.array(rng.normal(size=(b, t, cfg.img_h, cfg.img_w, 3)), jnp.float32)
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames,
    )
    apply_fn = jax.jit(lambda v, f: model.apply(v, f, None, train=False))
    outs, mem = apply_fn(variables, frames)
    k = cfg.test.nms_topk
    assert outs.kept.shape == (t, b, k, cfg.lane.dim)
    assert outs.kept_valid.shape == (t, b, k)
    assert outs.num_kept.shape == (t, b)
    assert np.all(np.array(outs.num_kept) >= 0)
    # bounded window: ring buffer has `window` rows
    assert mem.values.shape[2] == 2
    assert int(mem.t) == t

    # deterministic eval: second run identical
    outs2, _ = apply_fn(variables, frames)
    np.testing.assert_allclose(np.array(outs.kept), np.array(outs2.kept))


def test_route_predictions_modes():
    cfg_h = tiny_cfg(routing="hard")
    cfg_s = dataclasses.replace(cfg_h, routing="soft")
    s, b, a, dim = 3, 1, 4, cfg_h.lane.dim
    from phnet_tpu.models.head import HeadOutputs
    fir = jnp.zeros((s, b, a, dim))
    sec = jnp.ones((s, b, a, dim))
    diff = jnp.full((s, b, a), 0.75)
    out = HeadOutputs(fir, sec, diff, jnp.zeros((s, b, a, 4)))
    hard = route_predictions(cfg_h, out)
    soft = route_predictions(cfg_s, out)
    np.testing.assert_allclose(np.array(hard), 1.0)
    np.testing.assert_allclose(np.array(soft), 0.75)


def test_streaming_memory_carry():
    """Chunked inference with carried memory == one long clip (same params)."""
    cfg = tiny_cfg(window=8)
    model = PHNet(cfg)
    rng = np.random.default_rng(2)
    b, t = 1, 4
    frames = jnp.array(rng.normal(size=(b, t, cfg.img_h, cfg.img_w, 3)), jnp.float32)
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames,
    )
    full, _ = jax.jit(lambda v, f: model.apply(v, f, None, train=False))(
        variables, frames)
    mem = init_memory(cfg, b, 8)
    chunk_fn = jax.jit(
        lambda v, f, m: model.apply(v, f, None, train=False, initial_memory=m))
    out1, mem = chunk_fn(variables, frames[:, :2], mem)
    out2, mem = chunk_fn(variables, frames[:, 2:], mem)
    np.testing.assert_allclose(
        np.array(full.kept[:2]), np.array(out1.kept), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.array(full.kept[2:]), np.array(out2.kept), rtol=1e-4, atol=1e-5)


def test_einsum_pool_matches_bilinear_sample():
    """The MXU-friendly one-hot-einsum pool in LaneHead._pool must equal the
    gather-based bilinear sampler (grid_sample semantics incl. zero pad)."""
    from phnet_tpu.models.head import LaneHead
    from phnet_tpu.ops.sampler import bilinear_sample

    cfg = tiny_cfg()
    head = LaneHead(cfg)
    rng = np.random.default_rng(0)
    b, hh, ww, c = 2, 12, 24, cfg.head.prior_feat_channels
    feat = jnp.array(rng.normal(size=(b, hh, ww, c)), jnp.float32)
    priors = jnp.array(rng.uniform(-0.3, 1.3,
                                   (b, cfg.head.num_priors, cfg.lane.dim)),
                       jnp.float32)  # xs partially out of image

    pool_method = lambda m, f, p: m._pool(f, p)  # noqa: E731
    variables = head.init(jax.random.key(0), feat, priors, method=pool_method)
    got = head.apply(variables, feat, priors, method=pool_method)

    # oracle: original gather path
    from phnet_tpu.models.head import _sample_x_indices

    idx = _sample_x_indices(cfg.lane.n_offsets, cfg.head.sample_points)
    fys = np.flip(
        1.0 - idx.astype(np.float32) / cfg.lane.n_strips).copy()
    xs = np.array(priors)[..., cfg.lane.col_xs:][..., idx][..., ::-1]
    px = jnp.array(xs * (ww - 1))
    py = jnp.broadcast_to(jnp.array(fys)[None, None, :], px.shape) * (hh - 1)
    want = jax.vmap(
        lambda f, x, y: bilinear_sample(jnp.moveaxis(f, -1, 0), x, y)
    )(feat, px, py)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)


def test_space_to_depth_stem_exact():
    """The SD stem is the SAME function as the 7x7/s2 conv: identical
    param tree, identical outputs (up to f32 reassociation), identical
    gradients — so the flag is a pure layout choice, checkpoint-safe."""
    from phnet_tpu.models.resnet import ResNetBackbone, space_to_depth_stem

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 48, 64, 3)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(7, 7, 3, 8)) * 0.1, jnp.float32)

    # core transform vs the direct strided conv
    want = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = space_to_depth_stem(x, kernel)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)

    # full backbone: one set of variables drives both stems
    m_ref = ResNetBackbone(stage_channels=(8, 16, 24, 32))
    m_sd = ResNetBackbone(stage_channels=(8, 16, 24, 32),
                          stem="space_to_depth")
    variables = m_ref.init(jax.random.key(0), x)
    v_sd = m_sd.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v_sd))
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(v_sd)):
        assert a.shape == b.shape

    outs_ref = m_ref.apply(variables, x)
    outs_sd = m_sd.apply(variables, x)
    for a, b in zip(outs_ref, outs_sd):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-4, atol=1e-5)

    # gradient parity through the stem param
    def loss(v, module):
        return sum(jnp.sum(o**2) for o in module.apply(v, x))

    g_ref = jax.grad(loss)(variables, m_ref)["params"]["Conv_0"]["kernel"]
    g_sd = jax.grad(loss)(variables, m_sd)["params"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.array(g_sd), np.array(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_width_packed_stem_exact():
    """The width-packed stem is the SAME function as the 7x7/s2 conv
    (zero-copy half of the space-to-depth trick): identical param tree,
    outputs and gradients — a pure layout choice, checkpoint-safe."""
    from phnet_tpu.models.resnet import ResNetBackbone, width_packed_stem

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 48, 64, 3)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(7, 7, 3, 8)) * 0.1, jnp.float32)

    want = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = width_packed_stem(x, kernel)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=1e-5, atol=1e-5)

    m_ref = ResNetBackbone(stage_channels=(8, 16, 24, 32))
    m_wp = ResNetBackbone(stage_channels=(8, 16, 24, 32),
                          stem="width_packed")
    variables = m_ref.init(jax.random.key(0), x)
    v_wp = m_wp.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v_wp))

    outs_ref = m_ref.apply(variables, x)
    outs_wp = m_wp.apply(variables, x)
    for a, b in zip(outs_ref, outs_wp):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-4, atol=1e-5)

    def loss(v, module):
        return sum(jnp.sum(o**2) for o in module.apply(v, x))

    g_ref = jax.grad(loss)(variables, m_ref)["params"]["Conv_0"]["kernel"]
    g_wp = jax.grad(loss)(variables, m_wp)["params"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.array(g_wp), np.array(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_stage0_hoist_equality():
    """``HeadConfig.stage0_hoist`` batches stage 0's frame-local chain over
    all clip frames outside the temporal scan. It must be the SAME function
    as the in-scan path: identical inference outputs and train loss/grads
    to float-reassociation noise. (The hoist is a measured perf NEGATIVE on
    the v5e streaming bench — see the config field's comment — so it
    defaults off; this pins that the mechanism stays correct either way.)"""
    import flax

    base = tiny_cfg(window=3)
    cfg_on = dataclasses.replace(
        base, head=dataclasses.replace(base.head, stage0_hoist=True))
    cfg_off = dataclasses.replace(
        base, head=dataclasses.replace(base.head, stage0_hoist=False))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(1, 3, 96, 192, 3)).astype(np.float32))
    labels = make_labels(rng, 1, 3, base)

    m_on, m_off = PHNet(cfg_on), PHNet(cfg_off)
    variables = m_off.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        frames, None, train=False)
    v_on = m_on.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        frames, None, train=False)
    # same param tree either way (the hoisted call creates the same params)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v_on))

    o_on, mem_on = m_on.apply(variables, frames, None, train=False)
    o_off, mem_off = m_off.apply(variables, frames, None, train=False)
    np.testing.assert_array_equal(np.asarray(o_on.num_kept),
                                  np.asarray(o_off.num_kept))
    np.testing.assert_allclose(np.asarray(o_on.kept),
                               np.asarray(o_off.kept), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mem_on.values),
                               np.asarray(mem_off.values), atol=1e-5)

    def loss_fn(model):
        def f(params):
            vs = {**variables, "params": params}
            (outs, _), _ = model.apply(
                vs, frames, labels, train=True,
                rngs={"dropout": jax.random.key(7)},
                mutable=["batch_stats"])
            # simple differentiable reduction over both branches
            return (jnp.abs(outs.pred_fir).mean()
                    + jnp.abs(outs.pred_sec).mean()
                    + outs.diff.mean())
        return f

    l_on, g_on = jax.value_and_grad(loss_fn(m_on))(variables["params"])
    l_off, g_off = jax.value_and_grad(loss_fn(m_off))(variables["params"])
    assert abs(float(l_on) - float(l_off)) < 1e-5
    gmax = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)))
    assert gmax < 1e-4, gmax


def test_fused_bn_matches_flax():
    """ops/batchnorm.FusedBatchNorm == nn.BatchNorm: same param/stat
    tree, same train/eval outputs and running-stat updates, gradients
    equal to flax autodiff up to float reassociation."""
    import flax.linen as nn

    from phnet_tpu.ops.batchnorm import FusedBatchNorm

    class Flax(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=jnp.bfloat16)(x)

    class Fused(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return FusedBatchNorm(momentum=0.9, epsilon=1e-5,
                                  dtype=jnp.bfloat16,
                                  name="BatchNorm_0")(
                x, use_running_average=not train)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, (4, 6, 5, 8)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref, fus = Flax(), Fused()
    v_ref = ref.init(jax.random.key(0), x, True)
    v_fus = fus.init(jax.random.key(0), x, True)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fus))
    # non-trivial affine so grads exercise scale/bias
    v = jax.tree.map(lambda p: p, v_ref)
    v["params"]["BatchNorm_0"]["scale"] = jnp.asarray(
        rng.uniform(0.5, 2.0, (8,)).astype(np.float32))
    v["params"]["BatchNorm_0"]["bias"] = jnp.asarray(
        rng.normal(0, 1, (8,)).astype(np.float32))
    v["batch_stats"]["BatchNorm_0"]["mean"] = jnp.asarray(
        rng.normal(0, 1, (8,)).astype(np.float32))
    v["batch_stats"]["BatchNorm_0"]["var"] = jnp.asarray(
        rng.uniform(0.5, 2.0, (8,)).astype(np.float32))

    # eval: bit-comparable (same op order transcription)
    y_ref = ref.apply(v, x, False)
    y_fus = fus.apply(v, x, False)
    np.testing.assert_array_equal(np.array(y_ref, np.float32),
                                  np.array(y_fus, np.float32))

    # train: outputs + updated running stats
    y_ref, m_ref = ref.apply(v, x, True, mutable=["batch_stats"])
    y_fus, m_fus = fus.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.array(y_ref, np.float32),
                               np.array(y_fus, np.float32),
                               rtol=1e-2, atol=1e-2)  # bf16 outputs
    for a, b in zip(jax.tree.leaves(m_ref), jax.tree.leaves(m_fus)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-5, atol=1e-6)

    # grads vs flax autodiff (f32 path so reassociation is the only diff)
    xf = jnp.asarray(rng.normal(1.0, 2.0, (4, 6, 5, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 6, 5, 8)).astype(np.float32))

    def loss(params, module, xin):
        y = module.apply({**v, "params": params}, xin, True,
                         mutable=["batch_stats"])[0]
        return (y.astype(jnp.float32) * w).sum()

    g_ref = jax.grad(loss)(v["params"], ref, xf)
    g_fus = jax.grad(loss)(v["params"], fus, xf)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=2e-4, atol=2e-4)
    gx_ref = jax.grad(lambda xin: loss(v["params"], ref, xin))(xf)
    gx_fus = jax.grad(lambda xin: loss(v["params"], fus, xin))(xf)
    np.testing.assert_allclose(np.array(gx_ref), np.array(gx_fus),
                               rtol=2e-4, atol=2e-4)


def test_dual_branch_heads_equality():
    """head.dual_branch_heads computes BOTH branch head stacks as one
    zero-padded batched einsum chain — outputs must equal the separate
    path on the same params (padding contributes structural zeros)."""
    base = tiny_cfg(window=2)
    # pin BOTH sides explicitly: dual_branch_heads defaults True, so a
    # "default vs True" comparison would be vacuous
    cfg = dataclasses.replace(
        base, head=dataclasses.replace(base.head, dual_branch_heads=False))
    cfg_dual = dataclasses.replace(
        base, head=dataclasses.replace(base.head, dual_branch_heads=True))
    model = PHNet(cfg)
    model_d = PHNet(cfg_dual)
    rng = np.random.default_rng(4)
    frames = jnp.array(rng.normal(size=(1, 3, cfg.img_h, cfg.img_w, 3)),
                       jnp.float32)
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames)
    v2 = jax.jit(lambda r, f: model_d.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    out_a, _ = jax.jit(lambda v, f: model.apply(v, f, None, train=False))(
        variables, frames)
    out_b, _ = jax.jit(lambda v, f: model_d.apply(v, f, None, train=False))(
        variables, frames)
    np.testing.assert_allclose(np.array(out_a.kept), np.array(out_b.kept),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.array(out_a.num_kept),
                                  np.array(out_b.num_kept))

    # train mode too (criterion consumes pred_fir/pred_sec)
    labels = make_labels(rng, 1, 3, cfg)
    tr_a = jax.jit(lambda v, f, l, r: model.apply(
        v, f, l, train=True, rngs={"dropout": r},
        mutable=["batch_stats"]))(variables, frames, labels,
                                  jax.random.key(2))[0][0]
    tr_b = jax.jit(lambda v, f, l, r: model_d.apply(
        v, f, l, train=True, rngs={"dropout": r},
        mutable=["batch_stats"]))(variables, frames, labels,
                                  jax.random.key(2))[0][0]
    np.testing.assert_allclose(np.array(tr_a.pred_fir),
                               np.array(tr_b.pred_fir),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(tr_a.pred_sec),
                               np.array(tr_b.pred_sec),
                               rtol=1e-5, atol=1e-5)
