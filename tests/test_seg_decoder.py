"""SegDecoder parity vs the reference module (torch, CPU)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.models.seg_decoder import SegDecoder

REF = "/root/reference"


def test_seg_decoder_matches_reference():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from libs.models.utils.seg_decoder import SegDecoder as RefSegDecoder

    h_img, w_img, ncls, c, rl = 40, 80, 3, 8, 3
    torch.manual_seed(0)
    ref = RefSegDecoder(h_img, w_img, ncls, prior_feat_channels=c,
                        refine_layers=rl).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, c * rl, 10, 20)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()  # [B, ncls, H, W]

    ours_mod = SegDecoder(h_img, w_img, ncls)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = ours_mod.init(jax.random.key(0), x_nhwc)
    variables = {
        "params": {
            "conv": {
                "kernel": jnp.asarray(
                    ref.conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(ref.conv.bias.detach().numpy()),
            }
        }
    }
    ours = np.asarray(ours_mod.apply(variables, x_nhwc)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
