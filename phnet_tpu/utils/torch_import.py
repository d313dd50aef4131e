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


# ---------------------------------------------------------------------------
# Full reference-checkpoint import: RouterWithB (RouterV4.py:466) .pth.tar
# state_dict -> our PHNet variables. Inverse of the export mapping the
# torch-direct parity tests use (tests/test_reference_parity.py), so a user
# of the reference can run their trained checkpoint on TPU directly.
# ---------------------------------------------------------------------------


def _lin(sd: Dict, key: str) -> Dict:
    """torch Linear '<key>.weight/.bias' -> flax Dense {kernel, bias}."""
    return {"kernel": np.asarray(sd[key + ".weight"]).T,
            "bias": np.asarray(sd[key + ".bias"])}


def _ln(sd: Dict, key: str) -> Dict:
    return {"scale": np.asarray(sd[key + ".weight"]),
            "bias": np.asarray(sd[key + ".bias"])}


def strip_prefixes(state_dict: Dict) -> Dict:
    """Unwrap {'state_dict': ...} checkpoints and drop DDP 'module.'."""
    sd = state_dict.get("state_dict", state_dict)
    return {k[len("module."):] if k.startswith("module.") else k:
            np.asarray(v) for k, v in sd.items()}


def import_head_state_dict(sd: Dict, refine_layers: int = 3,
                           router_blocks: int = 4,
                           decoder_layers: int = 2) -> Dict:
    """Reference head keys (no prefix) -> our ``LaneHead`` params subtree
    (``frame/head``). Handles both the VIL ``RouterV2`` layout (cls+reg
    stacks, folded offsets) and the OL ``DetNetV2`` layout (separate
    iou_modules/iou_layers offsets head, learned position embedding)."""
    params: Dict = {
        "prior_embeddings": np.asarray(sd["prior_embeddings.weight"]),
        "pro_embedding": np.asarray(sd["pro_embedding.weight"]),
    }
    has_iou = any(k.startswith("iou_modules.") for k in sd)
    if "PositionEmbedding.embed.weight" in sd:
        params["pos_encoding"] = {
            "embedding": np.asarray(sd["PositionEmbedding.embed.weight"])}

    # merged branch heads: stack order (cls, reg[, iou]) matches
    # MergedBranchHeads' out_dims ordering
    stacks = ("cls", "reg", "iou") if has_iou else ("cls", "reg")
    for branch, suffix in (("heads_fir", ""), ("heads_sec", "_sec")):
        hp: Dict = {}
        for i in range(2):
            hp[f"fc{i}_kernel"] = np.stack([
                np.asarray(sd[f"{m}_modules{suffix}.{2 * i}.weight"]).T
                for m in stacks])
            hp[f"fc{i}_bias"] = np.stack([
                np.asarray(sd[f"{m}_modules{suffix}.{2 * i}.bias"])
                for m in stacks])
        for j, m in enumerate(stacks):
            hp[f"out{j}_kernel"] = np.asarray(
                sd[f"{m}_layers{suffix}.weight"]).T
            hp[f"out{j}_bias"] = np.asarray(sd[f"{m}_layers{suffix}.bias"])
        params[branch] = hp

    # dynamic heads
    for s in range(refine_layers):
        pre = f"DHead_series.{s}"
        dp: Dict = {}
        for ours, theirs in (("gen1_a", "dynamic_layer_1.0"),
                             ("gen1_b", "dynamic_layer_1.1"),
                             ("gen2_a", "dynamic_layer_2.0"),
                             ("gen2_b", "dynamic_layer_2.1"),
                             ("out_a", "out_layer.0"),
                             ("out_b", "out_layer.1")):
            dp[ours] = _lin(sd, f"{pre}.{theirs}")
        for n in ("norm1", "norm2", "norm3"):
            dp[n] = _ln(sd, f"{pre}.{n}")
        params[f"dyn_head_{s}"] = dp

    # routers (taps/conv_bias/ln_params packing, models/router.py)
    for s in range(refine_layers):
        a = params["prior_embeddings"].shape[0]
        taps = np.zeros((a, router_blocks * 18), np.float32)
        cbias = np.zeros((a, router_blocks * 2), np.float32)
        lnp = [np.asarray(sd[f"router.pre_norm.{s}.weight"]),
               np.asarray(sd[f"router.pre_norm.{s}.bias"])]
        for b in range(router_blocks):
            base = f"router.DWNets.{s}.{b}"
            taps[:, 18 * b: 18 * b + 9] = np.asarray(
                sd[f"{base}.0.weight"]).reshape(a, 9)
            cbias[:, 2 * b] = np.asarray(sd[f"{base}.0.bias"])
            taps[:, 18 * b + 9: 18 * b + 18] = np.asarray(
                sd[f"{base}.3.weight"]).reshape(a, 9)
            cbias[:, 2 * b + 1] = np.asarray(sd[f"{base}.3.bias"])
            lnp += [np.asarray(sd[f"{base}.1.weight"]),
                    np.asarray(sd[f"{base}.1.bias"]),
                    np.asarray(sd[f"{base}.4.weight"]),
                    np.asarray(sd[f"{base}.4.bias"])]
        params[f"router_{s}"] = {
            "taps": taps, "conv_bias": cbias,
            "ln_params": np.stack(lnp),
            "Dense_0": _lin(sd, f"router.layers.{s}.0"),
            "Dense_1": _lin(sd, f"router.layers.{s}.2"),
        }

    # temporal decoder (packed in_proj -> fused qkv/kv)
    td: Dict = {"final_norm": _ln(sd, "transformer_Dec.norm")}
    for i in range(decoder_layers):
        pre = f"transformer_Dec.layers.{i}"
        w_in = np.asarray(sd[f"{pre}.self_attn.in_proj_weight"])
        b_in = np.asarray(sd[f"{pre}.self_attn.in_proj_bias"])
        d = w_in.shape[1]
        lp: Dict = {
            "self_attn": {
                "qkv": {"kernel": w_in.T, "bias": b_in},
                "out": _lin(sd, f"{pre}.self_attn.out_proj"),
            }
        }
        w_in = np.asarray(sd[f"{pre}.multihead_attn.in_proj_weight"])
        b_in = np.asarray(sd[f"{pre}.multihead_attn.in_proj_bias"])
        lp["cross_attn"] = {
            "q": {"kernel": w_in[:d].T, "bias": b_in[:d]},
            "kv": {"kernel": w_in[d:].T, "bias": b_in[d:]},
            "out": _lin(sd, f"{pre}.multihead_attn.out_proj"),
        }
        for ours, theirs in (("ffn1", "linear1"), ("ffn2", "linear2")):
            lp[ours] = _lin(sd, f"{pre}.{theirs}")
        for n in ("norm1", "norm2", "norm3"):
            lp[n] = _ln(sd, f"{pre}.{n}")
        td[f"layer{i}"] = lp
    params["temporal_decoder"] = td
    return params


def import_fpn_state_dict(sd: Dict, levels: int = 3) -> Dict:
    """Reference mmdet-FPN keys (no prefix) -> our ``encoder/neck``."""
    neck: Dict = {}
    for i in range(levels):
        neck[f"lateral_{i}"] = {
            "kernel": _conv(sd[f"lateral_convs.{i}.conv.weight"]),
            "bias": np.asarray(sd[f"lateral_convs.{i}.conv.bias"]),
        }
        neck[f"fpn_{i}"] = {
            "kernel": _conv(sd[f"fpn_convs.{i}.conv.weight"]),
            "bias": np.asarray(sd[f"fpn_convs.{i}.conv.bias"]),
        }
    return neck


def load_reference_checkpoint(variables: Dict, state_dict: Dict,
                              refine_layers: int = 3,
                              decoder_layers: int = 2) -> Dict:
    """Load a full reference ``RouterWithB`` checkpoint (``trainVIL.py``
    save schema, incl. DDP 'module.' and {'state_dict': ...} wrapping)
    into our PHNet variables. Returns new variables; shapes are asserted
    against the existing tree so preset mismatches fail loudly."""
    import copy

    sd = strip_prefixes(state_dict)
    out = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})

    def sub(prefix):
        plen = len(prefix)
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}

    bb = sub("backbone.backbone.model.")
    if bb:
        p, st = import_resnet_state_dict(bb)
        out["params"]["encoder"]["backbone"] = _merge(
            out["params"]["encoder"]["backbone"], p)
        out["batch_stats"]["encoder"]["backbone"] = _merge(
            out["batch_stats"]["encoder"]["backbone"], st)
    nk = sub("backbone.neck.")
    if nk:
        out["params"]["encoder"]["neck"] = _merge(
            out["params"]["encoder"]["neck"], import_fpn_state_dict(nk))
    hd = sub("detNet.")
    if hd:
        out["params"]["frame"]["head"] = _merge(
            out["params"]["frame"]["head"],
            import_head_state_dict(hd, refine_layers=refine_layers,
                                   decoder_layers=decoder_layers))
    return out
