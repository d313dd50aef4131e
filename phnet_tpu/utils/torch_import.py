"""Import torchvision-style ResNet weights into the flax backbone.

The reference initializes its backbone from the torchvision ResNet-18
checkpoint (``libs/models/resnet.py:310-317``). This maps a torch
``state_dict`` (from ``torch.load`` of that file, or any torchvision
resnet18/34 checkpoint) onto our ``encoder/backbone`` params + batch stats,
enabling pretrained-parity runs when the user supplies the weights file
(this image has no network egress, so nothing is downloaded).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    # torch conv: [out, in, kh, kw] -> flax: [kh, kw, in, out]
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def import_resnet_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    depth: int = 18,
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2),
) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) subtrees for ``ResNetBackbone``.

    Layer naming in our backbone (flax auto-naming inside
    ``ResNetBackbone.__call__``): stem = Conv_0 / Norm_0; then blocks in
    order contribute BasicBlock_i modules each holding Conv_0/1(/2) and
    Norm_0/1(/2).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    params: Dict = {}
    stats: Dict = {}

    def put_norm(scope: str, prefix: str):
        params[scope] = {"BatchNorm_0": {
            "scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}}
        stats[scope] = {"BatchNorm_0": {
            "mean": sd[prefix + ".running_mean"],
            "var": sd[prefix + ".running_var"]}}

    params["Conv_0"] = {"kernel": _conv(sd["conv1.weight"])}
    put_norm("Norm_0", "bn1")

    block_idx = 0
    for stage, n_blocks in enumerate(stage_blocks):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            scope = f"BasicBlock_{block_idx}"
            bp: Dict = {
                "Conv_0": {"kernel": _conv(sd[t + ".conv1.weight"])},
                "Conv_1": {"kernel": _conv(sd[t + ".conv2.weight"])},
            }
            bs: Dict = {}
            bp["Norm_0"] = {"BatchNorm_0": {
                "scale": sd[t + ".bn1.weight"], "bias": sd[t + ".bn1.bias"]}}
            bs["Norm_0"] = {"BatchNorm_0": {
                "mean": sd[t + ".bn1.running_mean"],
                "var": sd[t + ".bn1.running_var"]}}
            bp["Norm_1"] = {"BatchNorm_0": {
                "scale": sd[t + ".bn2.weight"], "bias": sd[t + ".bn2.bias"]}}
            bs["Norm_1"] = {"BatchNorm_0": {
                "mean": sd[t + ".bn2.running_mean"],
                "var": sd[t + ".bn2.running_var"]}}
            if t + ".downsample.0.weight" in sd:
                bp["Conv_2"] = {"kernel": _conv(sd[t + ".downsample.0.weight"])}
                bp["Norm_2"] = {"BatchNorm_0": {
                    "scale": sd[t + ".downsample.1.weight"],
                    "bias": sd[t + ".downsample.1.bias"]}}
                bs["Norm_2"] = {"BatchNorm_0": {
                    "mean": sd[t + ".downsample.1.running_mean"],
                    "var": sd[t + ".downsample.1.running_var"]}}
            params[scope] = bp
            stats[scope] = bs
            block_idx += 1
    return params, stats


def load_pretrained_backbone(variables: Dict, state_dict: Dict) -> Dict:
    """Return a copy of the model variables with the backbone replaced by
    the imported torch weights."""
    import copy

    out = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})
    params, stats = import_resnet_state_dict(state_dict)
    out["params"]["encoder"]["backbone"] = _merge(
        out["params"]["encoder"]["backbone"], params)
    out["batch_stats"]["encoder"]["backbone"] = _merge(
        out["batch_stats"]["encoder"]["backbone"], stats)
    return out


def _merge(dst: Dict, src: Dict) -> Dict:
    for k, v in src.items():
        if isinstance(v, dict):
            dst[k] = _merge(dst.get(k, {}), v)
        else:
            import numpy as np

            expected = np.asarray(dst[k]).shape
            got = np.asarray(v).shape
            assert expected == got, (k, expected, got)
            dst[k] = v
    return dst
