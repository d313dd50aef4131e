"""Pallas weight-dequantizing matmul: int8 weights -> bf16 MXU, in VMEM.

Why this kernel exists: the XLA formulation of weight-only int8
(``ops/quant.py::w8_matmul_prequant`` — ``x_bf16 @ wq.astype(bf16)``) is
semantically right but measured a WASH on the streaming bench (ROADMAP,
2026-08-19): the ``convert(int8->bf16)`` is loop-invariant across the
temporal frame scan, so XLA hoists it and materializes the full bf16
kernel in HBM once — after which the scan re-reads *bf16* bytes every
frame and the bandwidth saving evaporates. The detect scan is
memory-bound precisely on those weight re-reads (~0.28 GB/frame, xplane;
the [4608,1024]/[1024,8192] DynamicConv generator pairs dominate).

A Pallas kernel is opaque to XLA: the int8 block is DMA'd HBM->VMEM and
dequantized in-register into the MXU operand, so the HBM traffic per
frame is the int8 bytes — half of bf16 — with no hoistable convert.

STATUS — measured NEGATIVE on v5e (2026-08-19), kept for A/B only. A
scan-amortized chain microbench at the real geometry (T=50 steps of
[240,4608]@[4608,1024] -> [240,1024]@[1024,8192], data-dependent carry
so nothing hoists, one fence per 500 steps):

    bf16       95.4 us/step   26.2 MB weights/step  (275 GB/s implied)
    w8-xla     89.3 us/step   13.1 MB               (147 GB/s)
    w8-pallas 103.4 us/step   13.1 MB               (127 GB/s)

The chain is NOT bandwidth-bound in isolation: bf16 already runs at
only ~34% of the v5e's 819 GB/s (and ~33% MFU — M=240 under-fills the
MXU's M dimension and the two dots serialize), so halving the weight
bytes moves little (w8-xla -6%) and this kernel's block pipeline loses
to XLA's own schedule (+8%). This also explains the model-level w8 wash
recorded in ROADMAP: the scan's 0.28 GB/frame is spread across many
latency-bound ops, not concentrated in a BW-saturated matmul. Revisit
if anchor count or batch grows enough to make the chains BW-bound.

Numerics match ``w8_matmul_prequant`` (bf16 multiplicands, f32
accumulation, per-output-column f32 rescale); the only divergence is
f32 reassociation across K-block partial sums (verified <= 1.5e-7
relative). Forward-only (the w8 path is inference-only by construction).

Reference semantics being accelerated: the generator chains of
``libs/models/utils/dynamic_head.py:31-59``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8_matmul_kernel(x_ref, wq_ref, sw_ref, out_ref, acc_ref, *, nk: int):
    """One (m, n) output tile, accumulated over the k grid axis.

    x: [M_blk, K_blk] bf16; wq: [K_blk, N_blk] int8; sw: [1, N_blk] f32;
    out: [M_blk, N_blk] f32; acc: f32 VMEM scratch of the out block.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # the dequant happens HERE, on the VMEM-resident int8 block — the
    # HBM side of the pipeline only ever moves int8 bytes
    w = wq_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:] * sw_ref[:]


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = -size % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@partial(jax.jit, static_argnames=("interpret",))
def w8_matmul_pallas(
    x: jnp.ndarray,    # [..., K] f32/bf16
    wq: jnp.ndarray,   # [K, N] int8 (pre-quantized, per-column scales)
    sw: jnp.ndarray,   # [N] f32
    interpret: bool = False,
) -> jnp.ndarray:
    """``x @ dequant(wq)`` with the dequant fused into the kernel.

    Drop-in for :func:`phnet_tpu.ops.quant.w8_matmul_prequant`; returns
    f32 [..., N]. Leading dims are flattened into rows.
    """
    k, n = wq.shape
    lead = x.shape[:-1]
    xm = x.reshape(-1, k).astype(jnp.bfloat16)
    m = xm.shape[0]

    m_blk = min(256, -(-m // 16) * 16)
    k_blk = 512 if k % 512 == 0 else 256
    n_blk = 512 if n % 512 == 0 else 256

    xm = _pad_to(_pad_to(xm, 0, m_blk), 1, k_blk)  # zero rows/cols: no-op
    wqp = _pad_to(_pad_to(wq, 0, k_blk), 1, n_blk)
    swp = _pad_to(sw.astype(jnp.float32).reshape(1, n), 1, n_blk)
    mp, kp = xm.shape
    np_ = wqp.shape[1]
    nm, nn, nk = mp // m_blk, np_ // n_blk, kp // k_blk

    out = pl.pallas_call(
        partial(_w8_matmul_kernel, nk=nk),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((m_blk, k_blk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blk, n_blk), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blk), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_blk, n_blk), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m_blk, n_blk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xm, wqp, swp)
    return out[:m, :n].reshape(*lead, n)
