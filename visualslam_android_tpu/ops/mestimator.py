"""Robust M-estimators: Tukey, Cauchy, Huber, LeastSquares.

Capability parity with the reference's header-only estimators
(jni/MEstimator.h:13-39): MAD-based sigma estimation (x4.6851 for
Tukey/Cauchy, x1.345 for Huber — MEstimator.h:67-77,:119-155), weights,
square-root weights, and objective scores. All inputs are *squared* errors,
as in the reference.

TPU-native differences: instead of sorting a dynamically sized std::vector
(MEstimator.h:72), `find_sigma_squared` takes a fixed-shape array plus a
validity mask and selects the masked median with one sort — so it runs inside
jit, vmapped over e.g. pyramid levels or LM iterations.
"""

from __future__ import annotations

import jax.numpy as jnp

TUKEY = "tukey"
CAUCHY = "cauchy"
HUBER = "huber"
LEAST_SQUARES = "least_squares"

_SIGMA_MULT = {TUKEY: 4.6851, CAUCHY: 4.6851, HUBER: 1.345}


def masked_median_of_squares(err_sq, mask):
    """Median of the valid entries, with the reference's index convention:
    after sorting, element [n/2] (MEstimator.h:73-74). Invalid entries sort
    to +inf; returns 0 if nothing is valid."""
    n = jnp.sum(mask)
    big = jnp.asarray(jnp.inf, err_sq.dtype)
    vals = jnp.sort(jnp.where(mask, err_sq, big))
    idx = jnp.clip(n // 2, 0, err_sq.shape[-1] - 1)
    med = vals[..., idx]
    return jnp.where(n > 0, med, 0.0), n


def find_sigma_squared(err_sq, mask=None, estimator=TUKEY):
    """MAD-based sigma^2 (MEstimator.h:67-77 and per-estimator variants):
    sigma = mult * 1.4826 * (1 + 5/(2n - 6)) * sqrt(median(err^2)).
    """
    if mask is None:
        mask = jnp.ones(err_sq.shape, bool)
    if estimator == LEAST_SQUARES:
        n = jnp.sum(mask)
        s = jnp.sum(jnp.where(mask, err_sq, 0.0))
        return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)
    med, n = masked_median_of_squares(err_sq, mask)
    nf = jnp.maximum(n.astype(err_sq.dtype), 4.0)  # guard 2n-6 > 0
    sigma = 1.4826 * (1.0 + 5.0 / (2.0 * nf - 6.0)) * jnp.sqrt(med)
    sigma = _SIGMA_MULT[estimator] * sigma
    return sigma * sigma


def find_sigma_squared_hist(err_sq, mask=None, estimator=TUKEY,
                            axis_name=None, bins=512,
                            log2_lo=-30.0, log2_hi=24.0):
    """MAD sigma^2 from a log2-spaced HISTOGRAM of the squared errors
    instead of an exact masked median — the distributed form.

    `find_sigma_squared` needs the full error distribution; under a mesh
    axis that costs an all_gather of every shard's error table (N*O floats
    + masks — megabytes at KITTI scale, the single largest collective in
    sharded BA; see parallel/sharded_ba.comm_bytes_per_lm_step). The
    histogram is exactly additive across shards, so one psum of `bins`
    f32 counts (2 KB) replaces that gather. The median is interpolated
    uniformly-in-log within its bin: resolution is (log2_hi-log2_lo)/bins
    octaves (~0.105 at the defaults, i.e. sigma within a few percent),
    far inside the slack of the MAD estimate itself, and the min-sigma
    clamp (jni/Bundle.cc:224) bounds any downstream effect.
    """
    from jax import lax

    if mask is None:
        mask = jnp.ones(err_sq.shape, bool)
    e = err_sq.reshape(-1)
    m = mask.reshape(-1)
    dtype = e.dtype
    # Counts/cumsums accumulate in f32 regardless of the input dtype:
    # with bf16/f16 errors, counts above 2048 would quantize in the
    # input dtype and silently corrupt the median rank.
    acc = jnp.float32

    if estimator == LEAST_SQUARES:
        n = jnp.sum(m.astype(acc))
        s = jnp.sum(jnp.where(m, e, 0.0).astype(acc))
        if axis_name is not None:
            n = lax.psum(n, axis_name)
            s = lax.psum(s, axis_name)
        return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 0.0).astype(dtype)

    scale = bins / (log2_hi - log2_lo)
    l2 = jnp.log2(jnp.maximum(e, jnp.asarray(2.0, dtype) ** log2_lo))
    idx = jnp.clip(
        jnp.floor((l2 - log2_lo) * scale).astype(jnp.int32), 0, bins - 1
    )
    hist = jnp.zeros(bins, acc).at[idx].add(m.astype(acc))
    if axis_name is not None:
        hist = lax.psum(hist, axis_name)

    n = jnp.sum(hist)
    # Reference convention: element [n/2] of the sorted values
    # (MEstimator.h:73-74) == rank floor(n/2) zero-based.
    target = jnp.floor(n / 2.0)
    cum = jnp.cumsum(hist)
    b = jnp.argmax(cum > target)  # first bin whose cum count passes rank
    cum_before = cum[b] - hist[b]
    frac = jnp.clip(
        (target + 0.5 - cum_before) / jnp.maximum(hist[b], 1.0), 0.0, 1.0
    )
    med_log2 = log2_lo + (b.astype(acc) + frac) / scale
    med = jnp.asarray(2.0, acc) ** med_log2
    med = jnp.where(n > 0, med, 0.0)

    nf = jnp.maximum(n, 4.0)
    sigma = 1.4826 * (1.0 + 5.0 / (2.0 * nf - 6.0)) * jnp.sqrt(med)
    sigma = _SIGMA_MULT[estimator] * sigma
    return (sigma * sigma).astype(dtype)


def square_root_weight(err_sq, sigma_sq, estimator=TUKEY):
    if estimator == TUKEY:
        # MEstimator.h:48-55
        return jnp.where(err_sq > sigma_sq, 0.0, 1.0 - err_sq / sigma_sq)
    if estimator == CAUCHY:
        return jnp.sqrt(weight(err_sq, sigma_sq, CAUCHY))
    if estimator == HUBER:
        return jnp.sqrt(weight(err_sq, sigma_sq, HUBER))
    return jnp.ones_like(err_sq)


def weight(err_sq, sigma_sq, estimator=TUKEY):
    if estimator == TUKEY:
        w = square_root_weight(err_sq, sigma_sq, TUKEY)
        return w * w
    if estimator == CAUCHY:
        # MEstimator.h:85-88
        return 1.0 / (1.0 + err_sq / sigma_sq)
    if estimator == HUBER:
        # MEstimator.h:119-125
        safe = jnp.maximum(err_sq, 1e-30)
        return jnp.where(err_sq < sigma_sq, 1.0, jnp.sqrt(sigma_sq / safe))
    return jnp.ones_like(err_sq)


def objective_score(err_sq, sigma_sq, estimator=TUKEY):
    if estimator == TUKEY:
        # MEstimator.h:57-64 (scaled: no sigma^2/6 factor, as in reference)
        d = 1.0 - err_sq / sigma_sq
        return jnp.where(err_sq > sigma_sq, 1.0, 1.0 - d * d * d)
    if estimator == CAUCHY:
        return jnp.log1p(err_sq / sigma_sq)
    if estimator == HUBER:
        sigma = jnp.sqrt(sigma_sq)
        err = jnp.sqrt(jnp.maximum(err_sq, 0.0))
        return jnp.where(
            err_sq < sigma_sq, 0.5 * err_sq, sigma * (err - 0.5 * sigma)
        )
    return err_sq
