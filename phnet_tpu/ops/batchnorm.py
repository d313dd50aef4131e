"""Training BatchNorm with a hand-written, reduction-fused backward.

The round-5 B=4 train trace attributes ~15 ms/step of top-level
``convert_reduce_fusion`` time to the stem/stage-1 BatchNorm statistics
and gradient reductions (each pass re-reads a 100-600 MB activation at
~20% of HBM bandwidth; ``profiles/train_b4_2026-08-20.txt`` and the
round-5 recapture). Flax's ``nn.BatchNorm`` under autodiff emits ~3
separate reduce passes per layer in the backward; this module computes
the standard closed-form BN backward with exactly two fused single-op
reduces (``sum g``, ``sum g*x_hat``) plus the dx elementwise pass.
(A one-pass variadic ``lax.reduce`` was tried and is a measured
NEGATIVE — see ``bn_batch_stats``.)

Semantics match ``flax.linen.BatchNorm(use_running_average=not train,
momentum=0.9, epsilon=1e-5, dtype=...)`` exactly:

* identical parameter / batch_stats tree ("scale"/"bias",
  "mean"/"var" under a ``BatchNorm_0`` scope — checkpoints are
  interchangeable, ``tests/test_model.py::test_fused_bn_matches_flax``),
* fast-variance statistics in f32 (``var = max(0, E[x^2] - E[x]^2)``),
* running stats ``ra = m*ra + (1-m)*batch`` skipped at init,
* the eval path transcribes flax's ``_normalize`` op-for-op (the torch
  import / clip-parity tests run through it bit-comparably),
* the backward is the exact closed form of the forward —
  ``dx = r*s*(g - mean(g) - x_hat*mean(g*x_hat))`` — equal to autodiff
  up to float reassociation.

Reference context: the reference trains with torch ``SyncBatchNorm``
(``trainVIL.py:156``); statistics over the GSPMD-sharded global batch
reproduce that here, including inside this custom vjp (the reduces are
global under jit sharding).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp


def bn_batch_stats(x: jnp.ndarray):
    """(mean, var) over all but the last axis — flax fast-variance
    semantics. Two separate ``jnp.sum`` reduces, NOT one variadic
    ``lax.reduce``: variadic tuple reduces don't participate in XLA
    fusion, so the f32 convert and the square MATERIALIZE as full-size
    f32 tensors plus layout copies (measured: the variadic form cost the
    B=4 train step ~190 ms/step in f32[64,192,384,64] materializations
    and copies, while standalone microbenches showed the two fused
    single reduces are even slightly faster — 174 vs 156 GB/s)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    mean = jnp.sum(x32, axes) / n
    mean2 = jnp.sum(x32 * x32, axes) / n
    return mean, jnp.maximum(0.0, mean2 - mean * mean)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_normalize(x, scale, bias, epsilon=1e-5):
    """Batch-stat normalization of ``x`` (stats computed inside, so XLA
    CSEs them with the caller's running-stats update), with the fused
    closed-form backward. Returns y in x's dtype promoted with the f32
    params — callers cast to their compute dtype like flax does."""
    y, _ = _bn_fwd(x, scale, bias, epsilon)
    return y


def _bn_fwd(x, scale, bias, epsilon):
    mean, var = bn_batch_stats(x)
    r = jax.lax.rsqrt(var + epsilon)
    # flax _normalize op order: y = (x - mean) * (rsqrt * scale) + bias
    y = (x - mean) * (r * scale) + bias
    return y, (x, mean, r, scale)


def _bn_bwd(epsilon, res, g):
    x, mean, r, scale = res
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    g32 = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * r
    # two fusable single-op reduces (see bn_batch_stats for why not one
    # variadic pass); the convert/multiply producers fuse INTO each
    # reduce, so nothing materializes at f32
    sum_g = jnp.sum(g32, axes)
    sum_gx = jnp.sum(g32 * xhat, axes)
    dx = (r * scale) * (g32 - sum_g / n - xhat * (sum_gx / n))
    return dx.astype(x.dtype), sum_gx, sum_g


bn_train_normalize.defvjp(
    lambda x, scale, bias, epsilon: _bn_fwd(x, scale, bias, epsilon),
    _bn_bwd,
)


class FusedBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm(use_running_average=not train)`` with
    the fused-backward training path. Same param/batch_stats names."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        feature_shape = (x.shape[-1],)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), feature_shape)
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), feature_shape)
        scale = self.param(
            "scale", nn.initializers.ones, feature_shape, jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, feature_shape, jnp.float32)

        if use_running_average:
            # transcribed flax _normalize op order on running stats
            y = x - ra_mean.value
            mul = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = y * mul + bias
        else:
            if not self.is_initializing():
                mean, var = bn_batch_stats(x)  # CSEd with the vjp fwd
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1 - self.momentum) * mean)
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var)
            y = bn_train_normalize(x, scale, bias, self.epsilon)
        dtype = self.dtype or jnp.result_type(x, scale, bias)
        return y.astype(dtype)
