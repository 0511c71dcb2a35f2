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
