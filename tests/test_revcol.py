"""RevCol backbone option: forward shapes, training step, layer-wise LR."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from phnet_tpu.config import BackboneConfig
from phnet_tpu.models import PHNet
from phnet_tpu.models.revcol import RevColBackbone

from test_model import make_labels, tiny_cfg


def test_revcol_backbone_shapes():
    bb = RevColBackbone(channels=(8, 16, 24, 32), layers=(1, 1, 2, 1),
                        num_subnet=2, drop_path=0.0)
    x = jnp.zeros((1, 64, 128, 3))
    variables = jax.jit(lambda r, xx: bb.init(r, xx, train=False))(
        jax.random.key(0), x)
    outs = bb.apply(variables, x, train=False)
    assert [o.shape for o in outs] == [
        (1, 16, 32, 8), (1, 8, 16, 16), (1, 4, 8, 24), (1, 2, 4, 32)]


def test_phnet_with_revcol_trains():
    from phnet_tpu.config import LossConfig, TrainConfig
    from phnet_tpu.losses import LaneCriterion
    from phnet_tpu.train import build_optimizer, create_train_state, make_train_step
    from phnet_tpu.train.optimizer import revcol_layer_scales

    base = tiny_cfg()
    cfg = dataclasses.replace(
        base,
        backbone=BackboneConfig(
            kind="revcol", in_channels=(8, 16, 24, 32),
            revcol_layers=(1, 1, 2, 1), revcol_num_subnet=2,
            revcol_drop_path=0.0,
        ),
    )
    model = PHNet(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.array(rng.normal(size=(1, 2, cfg.img_h, cfg.img_w, 3)),
                       jnp.float32)
    labels = make_labels(rng, 1, 2, cfg)
    tcfg = TrainConfig(loss=LossConfig())
    criterion = LaneCriterion(cfg, tcfg.loss)

    # plain init to get param tree for the layer-decay scales
    variables = jax.jit(lambda r, f, l: model.init(r, f, l, train=True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        frames, labels)
    scales = revcol_layer_scales(
        variables["params"], layers=(1, 1, 2, 1), num_subnet=2)
    flat = jax.tree_util.tree_leaves_with_path(scales)
    backbone_scales = [v for p, v in flat if "backbone" in jax.tree_util.keystr(p)]
    head_scales = [v for p, v in flat if "frame" in jax.tree_util.keystr(p)]
    assert min(backbone_scales) < max(head_scales)  # earlier layers decayed
    assert abs(max(head_scales) - 1.0) < 1e-9

    tx = build_optimizer(tcfg, 100, lr_scales=scales)
    state = create_train_state(model, cfg, jax.random.key(0), frames, labels, tx)
    step = jax.jit(make_train_step(model, criterion, tx))
    losses = []
    for i in range(3):
        state, metrics = step(state, frames, labels, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
