"""ROIGather parity vs the reference module.

mmcv is not in the image; its ``ConvModule`` (the only import) is stubbed
with the equivalent conv -> BN -> ReLU torch stack (bias='auto' => no
conv bias under a norm) — the stub mirrors mmcv's documented semantics,
so the comparison still pins every reference-authored computation
(roi_fea stage concat, fc+LN+ReLU, legacy-nearest resize, grouped-conv
query/W, scaled softmax attention, residual).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.models.roi_gather import ROIGather

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_roi():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    nn = torch.nn
    if REF not in sys.path:
        sys.path.insert(0, REF)

    class ConvModule(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, bias="auto", norm_cfg=None, **kw):
            super().__init__()
            use_bias = bias if isinstance(bias, bool) else norm_cfg is None
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride=stride, padding=padding,
                                  bias=use_bias)
            self.bn = nn.BatchNorm2d(out_channels)
            self.act = nn.ReLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    mmcv = types.ModuleType("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    mmcv_cnn.ConvModule = ConvModule
    mmcv.cnn = mmcv_cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = mmcv_cnn
    import importlib
    roi_gather = importlib.import_module("libs.models.utils.roi_gather")
    importlib.reload(roi_gather)  # in case an earlier stub imported it
    return torch, roi_gather.ROIGather


def _import_params(torch, ref, layers):
    """Map the reference state into our variables."""
    def conv_bn(mod):
        p = {"conv": {"kernel": jnp.asarray(
            mod.conv.weight.detach().numpy().transpose(2, 3, 1, 0))},
            "bn": {"scale": jnp.asarray(mod.bn.weight.detach().numpy()),
                   "bias": jnp.asarray(mod.bn.bias.detach().numpy())}}
        if mod.conv.bias is not None:
            p["conv"]["bias"] = jnp.asarray(mod.conv.bias.detach().numpy())
        st = {"bn": {"mean": jnp.asarray(mod.bn.running_mean.numpy()),
                     "var": jnp.asarray(mod.bn.running_var.numpy())}}
        return p, st

    params, stats = {}, {}
    for i in range(layers):
        params[f"convs_{i}"], stats[f"convs_{i}"] = conv_bn(ref.convs[i])
        params[f"catconv_{i}"], stats[f"catconv_{i}"] = conv_bn(
            ref.catconv[i])
    params["f_key"], stats["f_key"] = conv_bn(ref.f_key)
    params["f_value"] = {
        "kernel": jnp.asarray(
            ref.f_value.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(ref.f_value.bias.detach().numpy())}
    params["fc"] = {
        "kernel": jnp.asarray(ref.fc.weight.detach().numpy().T),
        "bias": jnp.asarray(ref.fc.bias.detach().numpy())}
    params["fc_norm"] = {
        "scale": jnp.asarray(ref.fc_norm.weight.detach().numpy()),
        "bias": jnp.asarray(ref.fc_norm.bias.detach().numpy())}
    # grouped Conv1d(A, A, 1, groups=A): weight [A, 1, 1] -> [A, 1]
    params["f_query_weight"] = jnp.asarray(
        ref.f_query[0].weight.detach().numpy()[:, :, 0])
    params["f_query_bias"] = jnp.asarray(
        ref.f_query[0].bias.detach().numpy())[:, None]
    params["W_weight"] = jnp.asarray(
        ref.W.weight.detach().numpy()[:, :, 0])
    params["W_bias"] = jnp.asarray(ref.W.bias.detach().numpy())[:, None]
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("layer_index", [0, 2])
def test_roi_gather_matches_reference(ref_roi, layer_index):
    torch, RefROIGather = ref_roi
    c, a, pts, fc, layers = 16, 12, 9, 16, 3
    torch.manual_seed(0)
    ref = RefROIGather(c, a, pts, fc, layers, mid_channels=8).eval()
    with torch.no_grad():
        # non-trivial BN stats and a non-zero W so attention context matters
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
        ref.W.weight.uniform_(-0.5, 0.5)
        ref.W.bias.uniform_(-0.1, 0.1)

    rng = np.random.default_rng(layer_index)
    b, h, w = 2, 20, 50
    rois_t = [
        rng.normal(size=(b * a, c, pts, 1)).astype(np.float32)
        for _ in range(layer_index + 1)
    ]
    x = rng.normal(size=(b, c, h, w)).astype(np.float32)

    with torch.no_grad():
        theirs = ref([torch.from_numpy(r) for r in rois_t],
                     torch.from_numpy(x), layer_index).numpy()

    ours_mod = ROIGather(c, a, pts, fc, layers, mid_channels=8)
    rois_j = [
        jnp.asarray(r.reshape(b, a, c, pts).transpose(0, 1, 3, 2))
        for r in rois_t
    ]
    # build the full variable tree once (init) then overwrite with imports
    variables = ours_mod.init(
        jax.random.key(0), rois_j, jnp.asarray(x.transpose(0, 2, 3, 1)),
        layer_index)
    imported = _import_params(torch, ref, layers)
    ours = np.asarray(ours_mod.apply(
        imported, rois_j, jnp.asarray(x.transpose(0, 2, 3, 1)), layer_index))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)

    # ROIGather_T (use_attention=False) == reference forward truncated at
    # the roi vector (libs/models/utils/roi_gather.py:224-256)
    with torch.no_grad():
        cat = ref.roi_fea([torch.from_numpy(r) for r in rois_t], layer_index)
        roi_t = cat.contiguous().view(b * a, -1)
        roi_t = torch.nn.functional.relu(ref.fc_norm(ref.fc(roi_t)))
        roi_t = roi_t.view(b, a, -1).numpy()
    mod_t = ROIGather(c, a, pts, fc, layers, mid_channels=8,
                      use_attention=False)
    ours_t = np.asarray(mod_t.apply(
        imported, rois_j, jnp.asarray(x.transpose(0, 2, 3, 1)), layer_index))
    np.testing.assert_allclose(ours_t, roi_t, rtol=2e-4, atol=2e-5)
