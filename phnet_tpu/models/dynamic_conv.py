"""Instance-interaction head with dynamically generated weights.

Reference ``libs/models/utils/dynamic_head.py:6-59`` (``DynamicConv``,
SparseRCNN-style): a proposal embedding generates a per-anchor weight matrix
[C, 2C]; the pooled ROI feature [P, C] is multiplied through it, then a
second generated matrix [2C, C] (conditioned on the stop-gradded
intermediate) maps back, followed by a flattening output MLP.

TPU mapping: the per-anchor bmm's become batched ``einsum`` contractions —
dense MXU work batched over (B, A); the weight-generator MLPs are the FLOPs
hot spot of the whole head and map straight onto the MXU.

Weight-generator collapse: the reference's generators are two stacked
``nn.Linear`` layers with *no activation between them*
(``dynamic_head.py:24-27`` — ``dynamic_layer_1/2`` are ``Sequential(Linear,
Linear)``), i.e. an affine∘affine chain. Whenever the bottleneck is wide
relative to the harmonic mean of the endpoint dims (hid >= in*out/(in+out))
the pair is computed as a *single* matmul against the pre-combined matrix
``K_a @ K_b`` — the exact same function with far fewer per-anchor FLOPs
(16x for the first generator, 15x for the out layer on the VIL preset).
The second generator (4608 -> 1024 -> 8192) keeps the factored form, which
is cheaper there.

Scan hoisting: the combine depends only on parameters, so it is
loop-invariant across the temporal frame scan — AND, more importantly, the
*backward* accumulation across frames is 16x/15x smaller when the scan body
sees only the combined matrices: ``lax.scan``'s VJP accumulates a cotangent
buffer per closed-over tensor per iteration, so factoring params inside the
loop drags ~94 MB/stage of factored-grad accumulator traffic through every
backward frame. :meth:`combined_weights` computes the collapsed weights for
the caller to evaluate OUTSIDE the scan and feed back through
``__call__(..., combined=...)`` (an ``nn.broadcast`` scan input); the
chain rule from combined to factored params then runs once per step, not
once per frame.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _dense_param(module: nn.Module, name: str, in_dim: int, out_dim: int):
    """A {kernel, bias} pair matching ``nn.Dense``'s parameter layout
    (lecun-normal kernel, zero bias), declared as one dict-valued param so
    the tree looks identical to an ``nn.Dense`` submodule's."""
    kernel_init = nn.initializers.lecun_normal()
    return module.param(
        name,
        lambda key: {
            "kernel": kernel_init(key, (in_dim, out_dim)),
            "bias": jnp.zeros((out_dim,)),
        },
    )


def _collapse_wins(in_dim: int, hid: int, out_dim: int) -> bool:
    """Direct costs in*out MACs/row; factored costs in*hid + hid*out —
    collapse wins iff hid >= in*out/(in+out)."""
    return hid * (in_dim + out_dim) >= in_dim * out_dim


def combine_dynamic_params(p: Dict, hidden_dim: int, dim_factor: int = 2,
                           quantize: str = "none", c_major: bool = False,
                           dtype=None) -> Dict:
    """Pure-function twin of :meth:`DynamicConv.combined_weights`, for
    hoisting the loop-invariant weight preparation OUT of a per-call jit
    entirely (a serving tick is one jit call, so XLA re-runs the chain
    combines, the c-major output permutation of the second generator and
    the compute-dtype casts every tick — ~0.3-0.4 ms of the B=8 tick,
    xplane 2026-08-21). ``StreamingServer`` evaluates this once at init
    and feeds the result through ``PHNet.apply(..., dyn_combined=...)``.

    ``p``: one DynamicConv param subtree ``{gen1_a, gen1_b, gen2_a,
    gen2_b, out_a, out_b}`` (each ``{"kernel", "bias"}``). Returns the
    dict :meth:`DynamicConv.__call__` accepts via ``combined=`` with
    ``pre_permuted=True``: the entries of ``combined_weights()`` (with
    ``c_major`` permutation pre-applied to the second generator's output
    side), plus — when the second generator stays factored un-quantized —
    a ``"gen2_factored"`` entry ``{k1, b1, k2, b2}`` with the permutation
    and dtype casts baked in. Exact: same ops in the same order as the
    in-graph path."""
    c = hidden_dim
    d = c * dim_factor
    pairs = {"gen1": (p["gen1_a"], p["gen1_b"]),
             "gen2": (p["gen2_a"], p["gen2_b"]),
             "out": (p["out_a"], p["out_b"])}
    perm = (np.arange(d * c).reshape(d, c).T.reshape(-1)
            if c_major else None)

    if quantize != "none":
        from ..ops.quant import quantize_colwise

        out = {}
        for name, (pa, pb) in pairs.items():
            if _collapse_wins(*pa["kernel"].shape, pb["kernel"].shape[1]):
                w, b = DynamicConv._combine(pa, pb)
                wq, sw = quantize_colwise(w)
                out[name] = {"wq": wq, "sw": sw, "b": b}
            else:
                wq1, sw1 = quantize_colwise(pa["kernel"])
                wq2, sw2 = quantize_colwise(pb["kernel"])
                out[name] = {"wq1": wq1, "sw1": sw1, "b1": pa["bias"],
                             "wq2": wq2, "sw2": sw2, "b2": pb["bias"]}
        if perm is not None:
            out["gen2"] = DynamicConv._permute_out_cols(out["gen2"], perm)
        return out

    out = {}
    cast = (lambda a: a.astype(dtype)) if dtype is not None else (lambda a: a)
    for name, (pa, pb) in pairs.items():
        if _collapse_wins(*pa["kernel"].shape, pb["kernel"].shape[1]):
            w, b = DynamicConv._combine(pa, pb)
            if name == "gen2" and perm is not None:
                w, b = w[:, perm], b[perm]
            out[name] = (cast(w), cast(b))
    if "gen2" not in out:
        k2, b2 = p["gen2_b"]["kernel"], p["gen2_b"]["bias"]
        if perm is not None:
            k2, b2 = k2[:, perm], b2[perm]
        out["gen2_factored"] = {
            "k1": cast(p["gen2_a"]["kernel"]), "b1": cast(p["gen2_a"]["bias"]),
            "k2": cast(k2), "b2": cast(b2)}
    return out


class DynamicConv(nn.Module):
    """V1 (``DynamicConv``, dynamic_head.py:6): roi channels == out dim.
    V2 (``DynamicConvV2`` :61, the multi-scale variant): per-stage roi
    channels map into a shared ``out_dim`` (256), ``param_reduction=4`` and
    ``out_hidden = 2 * out_dim``; set those fields accordingly."""

    feat_size: int = 36  # P
    hidden_dim: int = 64  # C (roi feature channels)
    dim_factor: int = 2  # dim_dynamic = C * factor
    param_reduction: int = 8
    out_expand: int = 6
    out_dim: int = 0  # 0 -> hidden_dim (V1); V2 uses reg_hidden_dim
    out_hidden: int = 0  # 0 -> hidden_dim * out_expand
    pro_dim: int = 0  # proposal-embedding dim; 0 -> out_dim (V2: the
    # reference's dynamic_layer_1 is Linear(outplanes, ...),
    # dynamic_head.py:72) which degrades to hidden_dim in V1
    dtype: jnp.dtype = jnp.float32
    quantize: str = "none"  # "int8" = w8a8 dynamic int8 (MXU s8 path);
    # "w8" = weight-only int8, dequantized in-register into the bf16 dot
    # (halves the scan's HBM weight reads, no activation-quant cost).
    # Both inference-only (ops/quant.py).

    def setup(self):
        if self.quantize not in ("none", "int8", "w8"):
            raise ValueError(
                "quantize must be one of 'none', 'int8', 'w8'; got %r"
                % (self.quantize,))
        c = self.hidden_dim
        d = c * self.dim_factor
        num_params = c * d
        hid = num_params // self.param_reduction
        out_dim = self.out_dim or c
        out_hidden = self.out_hidden or c * self.out_expand
        pro_dim = self.pro_dim or out_dim

        self.g1a = _dense_param(self, "gen1_a", pro_dim, hid)
        self.g1b = _dense_param(self, "gen1_b", hid, num_params)
        self.g2a = _dense_param(self, "gen2_a", self.feat_size * d, hid)
        self.g2b = _dense_param(self, "gen2_b", hid, num_params)
        self.oa = _dense_param(self, "out_a", self.feat_size * c, out_hidden)
        self.ob = _dense_param(self, "out_b", out_hidden, out_dim)
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)

    @staticmethod
    def _permute_out_cols(pre, perm):
        """Apply a static output-column permutation to any hoisted-weight
        form produced by :meth:`combined_weights` (collapsed or factored,
        plain or quantized). Exact: a permutation of the affine's output
        coordinates."""
        if isinstance(pre, tuple):  # plain collapsed (kernel, bias)
            w, b = pre
            return w[:, perm], b[perm]
        if "wq" in pre:  # quantized collapsed
            return {"wq": pre["wq"][:, perm], "sw": pre["sw"][perm],
                    "b": pre["b"][perm]}
        return {  # quantized factored: permute the SECOND matmul only
            "wq1": pre["wq1"], "sw1": pre["sw1"], "b1": pre["b1"],
            "wq2": pre["wq2"][:, perm], "sw2": pre["sw2"][perm],
            "b2": pre["b2"][perm],
        }

    @staticmethod
    def _combine(pa, pb) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(x @ Ka + ba) @ Kb + bb == x @ (Ka Kb) + (ba Kb + bb); runs in
        f32 on parameters only — exact up to float reassociation."""
        return pa["kernel"] @ pb["kernel"], pa["bias"] @ pb["kernel"] + pb["bias"]

    def combined_weights(self) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Collapsed (kernel, bias) per chain where the collapse wins; the
        caller evaluates this once OUTSIDE the temporal scan.

        Quantized modules ("int8" and "w8" alike) return a dict per chain
        instead, carrying the PRE-QUANTIZED int8 kernels + scales for every
        chain (collapsed: ``{"wq","sw","b"}``; factored: ``{"wq1","sw1",
        "b1","wq2","sw2","b2"}``) — weight quantization is loop-invariant,
        so hoisting it here leaves only the activation absmax ("int8") or
        nothing at all ("w8") inside the scan."""
        if self.quantize != "none":
            from ..ops.quant import quantize_colwise

            out = {}
            for name, (pa, pb) in (("gen1", (self.g1a, self.g1b)),
                                   ("gen2", (self.g2a, self.g2b)),
                                   ("out", (self.oa, self.ob))):
                if _collapse_wins(*pa["kernel"].shape, pb["kernel"].shape[1]):
                    w, b = self._combine(pa, pb)
                    wq, sw = quantize_colwise(w)
                    out[name] = {"wq": wq, "sw": sw, "b": b}
                else:
                    wq1, sw1 = quantize_colwise(pa["kernel"])
                    wq2, sw2 = quantize_colwise(pb["kernel"])
                    out[name] = {"wq1": wq1, "sw1": sw1, "b1": pa["bias"],
                                 "wq2": wq2, "sw2": sw2, "b2": pb["bias"]}
            return out
        out = {}
        if _collapse_wins(*self.g1a["kernel"].shape, self.g1b["kernel"].shape[1]):
            out["gen1"] = self._combine(self.g1a, self.g1b)
        if _collapse_wins(*self.g2a["kernel"].shape, self.g2b["kernel"].shape[1]):
            out["gen2"] = self._combine(self.g2a, self.g2b)
        if _collapse_wins(*self.oa["kernel"].shape, self.ob["kernel"].shape[1]):
            out["out"] = self._combine(self.oa, self.ob)
        return out

    def _affine_chain(self, x, pa, pb, pre=None):
        """x -> (x @ Ka + ba) @ Kb + bb, collapsed into one matmul whenever
        that is cheaper. On the VIL preset this collapses the first
        generator (64->1024->8192, 16x) and the out layer (2304->1024->64,
        15x) while keeping the second generator factored
        (4608->1024->8192). ``pre`` supplies the collapsed (kernel, bias)
        computed outside the scan (see module docstring)."""
        if self.quantize != "none":
            from ..ops.quant import (
                int8_affine, int8_matmul_prequant, quantize_colwise,
                w8_matmul_prequant)

            mm = (w8_matmul_prequant if self.quantize == "w8"
                  else int8_matmul_prequant)
            if pre is not None and "wq" in pre:  # hoisted, collapsed
                return (mm(x, pre["wq"], pre["sw"])
                        + pre["b"]).astype(self.dtype)
            if pre is not None:  # hoisted, factored
                y = mm(x, pre["wq1"], pre["sw1"]) + pre["b1"]
                return (mm(y, pre["wq2"], pre["sw2"])
                        + pre["b2"]).astype(self.dtype)
            if self.quantize == "w8":  # inline fallback (tests / no hoist)
                if _collapse_wins(x.shape[-1], pa["kernel"].shape[1],
                                  pb["kernel"].shape[1]):
                    w, b = self._combine(pa, pb)
                    wq, sw = quantize_colwise(w)
                    return (mm(x, wq, sw) + b).astype(self.dtype)
                wq1, sw1 = quantize_colwise(pa["kernel"])
                wq2, sw2 = quantize_colwise(pb["kernel"])
                y = mm(x, wq1, sw1) + pa["bias"]
                return (mm(y, wq2, sw2) + pb["bias"]).astype(self.dtype)
            if _collapse_wins(x.shape[-1], pa["kernel"].shape[1],
                              pb["kernel"].shape[1]):
                w, b = self._combine(pa, pb)
                return int8_affine(x, w, b).astype(self.dtype)
            y = int8_affine(x, pa["kernel"], pa["bias"])
            return int8_affine(y, pb["kernel"], pb["bias"]).astype(self.dtype)
        if pre is not None:
            w, b = pre
            return x @ w.astype(self.dtype) + b.astype(self.dtype)
        in_dim = x.shape[-1]
        hid = pa["kernel"].shape[1]
        out_dim = pb["kernel"].shape[1]
        if _collapse_wins(in_dim, hid, out_dim):
            w, b = self._combine(pa, pb)
            return x @ w.astype(self.dtype) + b.astype(self.dtype)
        y = x @ pa["kernel"].astype(self.dtype) + pa["bias"].astype(self.dtype)
        return y @ pb["kernel"].astype(self.dtype) + pb["bias"].astype(
            self.dtype)

    def __call__(
        self,
        pro_feat: jnp.ndarray,
        roi_feat: jnp.ndarray,
        combined: Optional[Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]] = None,
        c_major: bool = True,
        pre_permuted: bool = False,
    ) -> jnp.ndarray:
        """pro_feat: [B, A, pro_dim]; roi_feat: [B, A, P, C] -> [B, A, out].
        ``combined``: output of :meth:`combined_weights` evaluated outside
        the enclosing scan (optional — falls back to in-line collapse).
        ``pre_permuted``: ``combined`` came from
        :func:`combine_dynamic_params` with the c-major permutation (and a
        possible ``"gen2_factored"`` entry) already baked in — skip the
        in-graph permutation work.
        ``c_major``: emit the second generated weight C-major (an exact
        static column permutation — an inference layout win, see the w2
        block below) or in the natural d-major order. Heads pass
        ``c_major=not train``: the permutation's einsum backward inside the
        frame scan costs ~19% of training throughput (measured round 4:
        154.1 -> 125.6 clip-frames/s on the VIL train step) while the
        forward win it buys only matters for batched serving."""
        c = self.hidden_dim
        d = c * self.dim_factor
        combined = combined or {}

        pro_feat = pro_feat.astype(self.dtype)
        roi_feat = roi_feat.astype(self.dtype)

        # first generated weight: [B, A, C, D]
        w1 = self._affine_chain(pro_feat, self.g1a, self.g1b,
                                combined.get("gen1"))
        w1 = w1.reshape(*w1.shape[:-1], c, d)
        feats = jnp.einsum("bapc,bacd->bapd", roi_feat, w1)
        feats = self.norm1(feats)
        feats = nn.relu(feats)

        # second generated weight conditioned on stop-gradded activations
        # (dynamic_head.py:48-50 detaches before the generator MLP)
        gen_in = jax.lax.stop_gradient(feats).reshape(
            *feats.shape[:-2], self.feat_size * d
        )
        pre2 = combined.get("gen2")
        fac2 = combined.get("gen2_factored")
        if fac2 is not None:
            # hoisted factored second generator with casts (and, iff the
            # builder was given the same c_major, the permutation) baked
            # in — build-time and call-time c_major must agree, which the
            # serving path guarantees (both True)
            y = gen_in @ fac2["k1"].astype(self.dtype) + fac2["b1"].astype(
                self.dtype)
            w2 = y @ fac2["k2"].astype(self.dtype) + fac2["b2"].astype(
                self.dtype)
            if c_major:
                w2 = w2.reshape(*w2.shape[:-1], c, d)
                feats = jnp.einsum("bapd,bacd->bapc", feats, w2)
            else:
                w2 = w2.reshape(*w2.shape[:-1], d, c)
                feats = jnp.einsum("bapd,badc->bapc", feats, w2)
        elif c_major:
            # Emit w2 C-MAJOR by permuting the last generator's output
            # columns (exact — a static permutation of parameter columns,
            # hoisted out of the frame scan by XLA's loop-invariant code
            # motion). The natural d-major reshape [.., D, C] puts C
            # innermost, but the batched [P,D]@[D,C] contraction wants the
            # contracted D contiguous on the rhs — without this XLA inserts
            # two layout copies of the [B, A, D*C] generated weight per
            # stage (xplane B=32 serving tick: ~2.5 ms, 6% of the tick).
            perm = np.arange(d * c).reshape(d, c).T.reshape(-1)
            if pre2 is not None:
                if not pre_permuted:
                    pre2 = self._permute_out_cols(pre2, perm)
                g2b_p = self.g2b  # unused: _affine_chain takes pre2 path
            else:
                g2b_p = {"kernel": self.g2b["kernel"][:, perm],
                         "bias": self.g2b["bias"][perm]}
            w2 = self._affine_chain(gen_in, self.g2a, g2b_p, pre2)
            w2 = w2.reshape(*w2.shape[:-1], c, d)
            feats = jnp.einsum("bapd,bacd->bapc", feats, w2)
        else:
            # training layout: the permutation's backward (a scatter on the
            # w2 cotangent every frame of the scan) costs more than the
            # forward copies it saves — keep the natural d-major order
            w2 = self._affine_chain(gen_in, self.g2a, self.g2b, pre2)
            w2 = w2.reshape(*w2.shape[:-1], d, c)
            feats = jnp.einsum("bapd,badc->bapc", feats, w2)
        feats = self.norm2(feats)
        feats = nn.relu(feats)

        flat = feats.reshape(*feats.shape[:-2], self.feat_size * c)
        out = self._affine_chain(flat, self.oa, self.ob, combined.get("out"))
        out = self.norm3(out)
        return out.astype(jnp.float32)
