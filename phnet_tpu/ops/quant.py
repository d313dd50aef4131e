"""Dynamic int8 quantization for the MXU's double-rate path.

The v5e MXU runs s8xs8->s32 matmuls at 2x its bf16 FLOP rate (394 vs 197
TOPS), and the detect scan's FLOPs are dominated by the DynamicConv
generator chains (`models/dynamic_conv.py`; the second generator's
[A,4608]@[4608,1024]@[1024,8192] pair measured at ~85% bf16 MFU — at
roofline, so the only way further is a faster unit). This module provides
*dynamic* (per-call) symmetric int8 quantization:

- activations: per-row absmax scale (each anchor row quantized alone, so
  one outlier anchor cannot crush the rest of the batch's resolution);
- weights: per-output-column absmax scale;
- accumulation in int32 on the MXU (``preferred_element_type``), rescaled
  by the outer product of the two scale vectors.

No calibration pass, no quantized checkpoint format: weights stay f32 in
storage and are quantized in-graph (a [K,N] absmax+round is negligible
next to the [A,K]@[K,N] matmul it feeds — and XLA fuses it into the
operand's producer). Two modes, both inference-only (the round() has no
useful gradient — training guards against them):

- ``ModelConfig.quantize="int8"`` — w8a8: weights AND activations int8,
  the dot runs on the MXU's double-rate s8 path. The FLOP-rate lever, for
  batch-heavy serving where the chains are compute-bound.
- ``ModelConfig.quantize="w8"`` — weight-only: int8 weights are
  dequantized in-register into the bf16 dot (``w8_matmul_prequant``); no
  activation quantization cost inside the scan. The HBM-bandwidth lever
  for the weight-read-bound B=1 detect scan (halves the weight bytes).

LayerNorms after every generator matmul renormalize the quantization
error, which is why the head tolerates w8a8 on these chains (verified by
the quantized F1 gate in ``tests/test_e2e_quality.py``).

Measured on a real v5e (back-to-back A/B, idle host): **a wash** — VIL
streaming 733.6 fps int8 vs 754.3 bf16, OpenLane 799.5 vs 776.9 (within
tunnel noise). At these [A=240, K] shapes XLA's lowering does not realize
the 2x s8 MXU rate, and the per-row absmax+round inside the temporal scan
costs about what the matmul saves. The path stays opt-in
(``quantize="int8"``) for batch-heavy serving or future toolchains; bf16
is the default.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_rowwise(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over the last axis: returns (q [.., K] int8,
    scale [.., 1] f32) with x ~= q * scale."""
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_colwise(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per output column of a [K, N] kernel: returns
    (q [K, N] int8, scale [N] f32)."""
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_matmul_prequant(x: jnp.ndarray, wq: jnp.ndarray,
                         sw: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] against an ALREADY-quantized kernel (wq int8 [K, N],
    sw f32 [N]): dynamic per-row activation quantization, s8 MXU matmul,
    f32 rescale. Weight quantization is loop-invariant — hoist it out of
    the temporal scan via ``DynamicConv.combined_weights`` and feed the
    (wq, sw) here, so the scan body pays only the activation absmax."""
    xq, sx = quantize_rowwise(x.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw


def w8_matmul_prequant(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
                       ) -> jnp.ndarray:
    """Weight-only int8 (w8a16): x [..., K] bf16/f32 against an
    ALREADY-quantized kernel (wq int8 [K, N], sw f32 [N]). The kernel
    dequantizes IN-REGISTER into the dot's operand (int8 -> bf16 is exact
    for |v| <= 127; XLA fuses the convert into the matmul read), so the
    per-frame HBM traffic is the int8 bytes — half of bf16 — while the
    matmul itself runs the ordinary bf16 MXU path with f32 accumulation.
    Unlike :func:`int8_matmul_prequant` there is NO activation
    quantization: nothing extra runs inside the temporal scan, and the
    numerics are strictly tighter than w8a8 (weights-only rounding).
    The per-column scale is applied to the f32 accumulator."""
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc * sw


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] f32/bf16 @ w [K, N] f32 with dynamic w8a8: int8 MXU
    matmul, int32 accumulation, f32 rescale. Returns [..., N] f32."""
    wq, sw = quantize_colwise(w.astype(jnp.float32))
    return int8_matmul_prequant(x, wq, sw)


def int8_affine(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quantized ``x @ kernel + bias`` (bias stays f32)."""
    y = int8_matmul(x, kernel)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y
