"""WarpModel / flow_warp parity vs the reference DFF warpModel (torch)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.models.flow_warp import WarpModel, flow_warp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_warp():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # DFF.py imports torchvision at top solely for featModel's resnet18;
    # warpModel never touches it and torchvision isn't in the image
    import types
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet18 = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("torchvision stub"))
    tv.models = tv_models
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv_models)
    from libs.models.DFF import warpModel
    return torch, warpModel


def test_flow_warp_matches_grid_sample(ref_warp):
    torch, _ = ref_warp
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    b, h, w, c = 2, 8, 12, 5
    feat = rng.normal(size=(b, h, w, c)).astype(np.float32)
    flow = rng.uniform(-0.4, 0.4, size=(b, h, w, 2)).astype(np.float32)

    ours = np.asarray(flow_warp(jnp.asarray(feat), jnp.asarray(flow)))

    # reference flow_warp (DFF.py:105-117): base grid + flow, then
    # grid_sample(bilinear, align_corners=True)
    gy, gx = torch.meshgrid(
        torch.linspace(-1.0, 1.0, h), torch.linspace(-1.0, 1.0, w),
        indexing="ij")
    grid = torch.stack([gx, gy], -1)[None].repeat(b, 1, 1, 1)
    grid = grid + torch.from_numpy(flow)
    theirs = F.grid_sample(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)), grid,
        mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_warp_model_matches_reference(ref_warp):
    torch, warpModel = ref_warp

    # the reference conv is Conv2d(outplane*2, outplane) but receives
    # concat([curr, warped]) with inplane*2 channels — it only runs when
    # inplane == outplane (as in its one taskModel use)
    inp, outp = 6, 6
    torch.manual_seed(0)
    ref = warpModel(inp, outp).eval()
    # give the frozen BN non-trivial statistics
    with torch.no_grad():
        ref.bn.running_mean.uniform_(-0.5, 0.5)
        ref.bn.running_var.uniform_(0.5, 1.5)
        ref.bn.weight.uniform_(0.5, 1.5)
        ref.bn.bias.uniform_(-0.5, 0.5)

    rng = np.random.default_rng(1)
    b, h, w = 1, 10, 14
    last = rng.normal(size=(b, h, w, inp)).astype(np.float32)
    curr = rng.normal(size=(b, h, w, inp)).astype(np.float32)
    flow_n = rng.uniform(-0.3, 0.3, size=(b, h, w, 2)).astype(np.float32)

    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(last.transpose(0, 3, 1, 2)),
            torch.from_numpy(curr.transpose(0, 3, 1, 2)),
            torch.from_numpy(flow_n.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)

    ours_mod = WarpModel(inp, outp)
    variables = {
        "params": {
            "conv": {"kernel": jnp.asarray(
                ref.conv.weight.detach().numpy().transpose(2, 3, 1, 0))},
            "bn": {
                "weight": jnp.asarray(ref.bn.weight.numpy()),
                "bias": jnp.asarray(ref.bn.bias.numpy()),
                "running_mean": jnp.asarray(ref.bn.running_mean.numpy()),
                "running_var": jnp.asarray(ref.bn.running_var.numpy()),
            },
        }
    }
    ours = np.asarray(ours_mod.apply(
        variables, jnp.asarray(last), jnp.asarray(curr), jnp.asarray(flow_n)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
