"""M-estimator golden tests (SURVEY.md §4.1: Tukey MAD sigma per
jni/MEstimator.h:67-77)."""

import jax.numpy as jnp
import numpy as np
import pytest

from visualslam_android_tpu.ops import mestimator as me


def _reference_sigma_squared(err_sq, mult):
    # Literal transcription of MEstimator.h:67-77 semantics (oracle).
    v = np.sort(np.asarray(err_sq, np.float64))
    med = v[len(v) // 2]
    sigma = 1.4826 * (1 + 5.0 / (len(v) * 2 - 6)) * np.sqrt(med)
    sigma *= mult
    return sigma * sigma


@pytest.mark.parametrize(
    "est,mult", [(me.TUKEY, 4.6851), (me.CAUCHY, 4.6851), (me.HUBER, 1.345)]
)
def test_find_sigma_squared_matches_reference(rng, est, mult):
    err_sq = rng.exponential(size=101).astype(np.float32) ** 2
    got = float(me.find_sigma_squared(jnp.asarray(err_sq), estimator=est))
    want = _reference_sigma_squared(err_sq, mult)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_find_sigma_squared_masked(rng):
    err_sq = rng.exponential(size=128).astype(np.float32)
    mask = np.zeros(128, bool)
    mask[:51] = True
    got = float(
        me.find_sigma_squared(jnp.asarray(err_sq), jnp.asarray(mask), me.TUKEY)
    )
    want = _reference_sigma_squared(err_sq[:51], 4.6851)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_tukey_weight_values():
    # MEstimator.h:42-55: sqrt-weight = 1 - e2/s2 clipped at 0; weight = sq.
    s2 = 4.0
    assert float(me.square_root_weight(0.0, s2, me.TUKEY)) == 1.0
    assert float(me.square_root_weight(2.0, s2, me.TUKEY)) == 0.5
    assert float(me.square_root_weight(5.0, s2, me.TUKEY)) == 0.0
    assert float(me.weight(2.0, s2, me.TUKEY)) == 0.25


def test_huber_weight_values():
    s2 = 4.0
    assert float(me.weight(1.0, s2, me.HUBER)) == 1.0
    np.testing.assert_allclose(float(me.weight(16.0, s2, me.HUBER)), 0.5)


def test_cauchy_weight_values():
    np.testing.assert_allclose(float(me.weight(4.0, 4.0, me.CAUCHY)), 0.5)
    np.testing.assert_allclose(
        float(me.objective_score(4.0, 4.0, me.CAUCHY)), np.log(2.0), rtol=1e-6
    )


def test_tukey_objective_score():
    # MEstimator.h:57-64.
    assert float(me.objective_score(5.0, 4.0, me.TUKEY)) == 1.0
    d = 1.0 - 2.0 / 4.0
    np.testing.assert_allclose(
        float(me.objective_score(2.0, 4.0, me.TUKEY)), 1.0 - d**3, rtol=1e-6
    )


def test_least_squares(rng):
    e = rng.exponential(size=64).astype(np.float32)
    got = float(me.find_sigma_squared(jnp.asarray(e), estimator=me.LEAST_SQUARES))
    np.testing.assert_allclose(got, e.mean(), rtol=1e-5)
    assert float(me.weight(100.0, 1.0, me.LEAST_SQUARES)) == 1.0


def test_hist_sigma_close_to_exact(rng):
    """The log2-histogram median (distributed sigma path, one [bins] psum
    instead of an error-table all_gather) must track the exact masked
    median within the bin-interpolation tolerance."""
    err_sq = (rng.normal(size=20000).astype(np.float32) ** 2) * 3.7
    mask = rng.random(20000) < 0.8
    exact = float(
        me.find_sigma_squared(jnp.asarray(err_sq), jnp.asarray(mask))
    )
    hist = float(
        me.find_sigma_squared_hist(jnp.asarray(err_sq), jnp.asarray(mask))
    )
    assert exact > 0
    assert abs(hist - exact) / exact < 0.05, (hist, exact)


def test_hist_sigma_scale_sweep(rng):
    """Accuracy must hold across many orders of magnitude of error scale
    (the histogram spans 2^-30..2^24 in squared-error units)."""
    base = rng.exponential(size=4096).astype(np.float32)
    for scale in (1e-4, 1e-2, 1.0, 1e2, 1e4):
        err_sq = base * scale
        exact = float(me.find_sigma_squared(jnp.asarray(err_sq)))
        hist = float(me.find_sigma_squared_hist(jnp.asarray(err_sq)))
        assert abs(hist - exact) / exact < 0.05, (scale, hist, exact)


def test_hist_sigma_empty_mask():
    err_sq = jnp.ones(64, jnp.float32)
    mask = jnp.zeros(64, bool)
    assert float(me.find_sigma_squared_hist(err_sq, mask)) == 0.0


def test_hist_sigma_least_squares(rng):
    err_sq = rng.exponential(size=512).astype(np.float32)
    mask = rng.random(512) < 0.7
    want = float(np.mean(err_sq[mask]))
    got = float(
        me.find_sigma_squared_hist(
            jnp.asarray(err_sq), jnp.asarray(mask), me.LEAST_SQUARES
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hist_sigma_bf16_counts_dont_quantize(rng):
    """Histogram counts must accumulate in f32 even for bf16 inputs:
    above 2048 a bf16 count quantizes (2048+1 == 2048) and the median
    rank silently corrupts (ADVICE r2)."""
    err_sq = rng.exponential(size=16384).astype(np.float32)
    exact = float(me.find_sigma_squared(jnp.asarray(err_sq)))
    hist_bf16 = float(
        me.find_sigma_squared_hist(jnp.asarray(err_sq, jnp.bfloat16))
    )
    # bf16 values themselves carry ~3 decimal digits; allow their
    # quantization plus the histogram bin-interpolation tolerance.
    assert abs(hist_bf16 - exact) / exact < 0.10, (hist_bf16, exact)
