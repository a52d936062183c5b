"""Tests for the 4D components: respiratory signal, correspondence model,
binning, peaks, MTF and the demons registration."""

import numpy as np
import pytest

from cbctmc_tpu.analysis.binning import (
    calculate_amplitude_bins,
    calculate_median_cycle,
    calculate_phase,
    calculate_phase_bins,
    calculate_respiratory_statistics,
    scale_signal_to_phase_for_rooster,
    split_into_cycles,
)
from cbctmc_tpu.analysis.mtf import calculate_mtf, extract_line_pair_profile, michelson_contrast
from cbctmc_tpu.analysis.peaks import find_peaks
from cbctmc_tpu.pipeline.correspondence import CorrespondenceModel
from cbctmc_tpu.pipeline.respiratory import RespiratorySignal


def test_respiratory_signal_basics():
    sig = RespiratorySignal.create_cos4(total_seconds=60, period=5.0)
    assert sig.total_seconds == pytest.approx(60, rel=0.01)
    assert sig.signal.max() <= 1.0 and sig.signal.min() >= 0.0

    resampled = sig.resample(15.0)
    assert len(resampled.signal) == 900
    # derivative consistency at a coarse level
    assert np.corrcoef(
        np.gradient(resampled.signal, 1 / 15.0), resampled.dt_signal
    )[0, 1] > 0.97


def test_resample_covers_every_projection():
    # regression: int() truncation dropped the last sample when
    # total_seconds * frequency landed at N - epsilon (e.g. 72 projections
    # at 15 fps from a 25 Hz source), leaving a 71-entry
    # projection_geometries.yaml for a 72-view 4D scan
    for n_projections in (7, 8, 72, 120, 894):
        total = n_projections / 15.0
        sig = RespiratorySignal.create_sin4(
            total_seconds=total, period=total, sampling_frequency=25.0
        )
        resampled = sig.resample(15.0)
        assert len(resampled.signal) >= n_projections


def test_quantization_and_unique_signals():
    sig = RespiratorySignal.create_sin4(total_seconds=30)
    q = RespiratorySignal.quantize_signal(sig.signal, n_bins=10)
    # n_bins centres (+1: the exact maximum lands past the last edge, as in
    # the reference implementation)
    assert len(np.unique(q)) <= 11
    dq = RespiratorySignal.quantize_signal(sig.dt_signal, n_bins=10)
    unique = RespiratorySignal.get_unique_signals(q, dq)
    # indices partition the projection range
    all_idx = sorted(i for indices in unique.values() for i in indices)
    assert all_idx == list(range(len(q)))


def test_respiratory_save_load(tmp_path):
    sig = RespiratorySignal.create_cos4(total_seconds=10)
    sig.save(tmp_path / "sig.pkl")
    loaded = RespiratorySignal.load(tmp_path / "sig.pkl")
    np.testing.assert_allclose(loaded.signal, sig.signal)
    np.testing.assert_allclose(loaded.dt_signal, sig.dt_signal)


def test_correspondence_model_roundtrip(tmp_path):
    """A linear field-signal relationship must be recovered exactly."""
    rng = np.random.default_rng(0)
    t, shape = 10, (6, 7, 8)
    signals = np.stack([np.sin(np.linspace(0, 2 * np.pi, t)),
                        np.cos(np.linspace(0, 2 * np.pi, t))])
    basis = rng.normal(size=(2, 3, *shape))
    mean = rng.normal(size=(3, *shape))
    fields = np.einsum("dt,dcxyz->tcxyz", signals, basis) + mean

    model = CorrespondenceModel().fit(
        vector_fields=fields, signals=signals, reference_phase=2
    )
    probe = np.array([0.3, -0.5])
    expected = np.einsum("d,dcxyz->cxyz", probe, basis) + mean
    np.testing.assert_allclose(model.predict(probe), expected, atol=1e-3)

    path = model.save(tmp_path / "model")
    assert model.model_hash[:7] in path.name
    loaded = CorrespondenceModel.load(path)
    np.testing.assert_allclose(loaded.predict(probe), expected, atol=1e-3)


def test_peaks_on_periodic_signal():
    t = np.linspace(0, 10, 500)
    x = np.sin(2 * np.pi * t) + 0.05 * np.sin(17 * t)
    peaks = find_peaks(x)
    assert 8 <= len(peaks) <= 12
    # peak spacing ~ one period (50 samples)
    assert np.median(np.diff(peaks)) == pytest.approx(50, abs=5)


def test_binning_pipeline():
    sig = RespiratorySignal.create_cos4(total_seconds=60).signal
    cycles = split_into_cycles(sig)
    assert len(cycles) >= 10
    stats = calculate_respiratory_statistics(sig, sampling_rate=25.0)
    assert stats.median_cycle_period == pytest.approx(5.0, rel=0.15)

    median_cycle = calculate_median_cycle(sig)
    assert len(median_cycle) == pytest.approx(125, abs=15)

    bins = calculate_amplitude_bins(sig, n_bins=10)
    # values outside the median cycle's range map to -1 / n_bins by design
    assert bins.min() >= -1 and bins.max() <= 10
    assert np.isin(np.arange(10), bins).all()

    phase_bins = calculate_phase_bins(sig, n_bins=10)
    assert set(np.unique(phase_bins)).issubset(set(range(10)))

    phase01 = scale_signal_to_phase_for_rooster(sig)
    assert (phase01 >= 0).all() and (phase01 < 1).all()

    phases = calculate_phase(sig)
    assert not np.isnan(np.hstack(phases)).any()


def test_phase_on_single_cycle_signal():
    # AMPD finds no interior peak on signals shorter than ~2 cycles (e.g.
    # a single-breath 4D demo acquisition); calculate_phase must anchor at
    # the global maximum instead of crashing (regression: runs/4d_demo).
    t = np.linspace(0.0, 1.0, 120)
    sig = np.sin(np.pi * t) ** 4  # one breath, peak mid-signal
    phase01 = scale_signal_to_phase_for_rooster(sig)
    assert phase01.shape == sig.shape
    assert not np.isnan(phase01).any()
    assert (phase01 >= 0).all() and (phase01 < 1).all()
    assert phase01[np.argmax(sig)] == pytest.approx(0.0, abs=1e-6)

    # degenerate monotone / constant signals must not crash either
    for sig in (np.linspace(1, 0, 50), np.linspace(0, 1, 50), np.ones(30)):
        p = scale_signal_to_phase_for_rooster(sig)
        assert not np.isnan(p).any()


def test_mtf():
    assert michelson_contrast(np.array([0.0, 1.0])) == 1.0
    mtf = calculate_mtf(
        line_pair_spacings=[4.0, 2.0, 1.0],
        line_pair_maximums=[1.0, 0.8, 0.6],
        line_pair_minimums=[0.0, 0.2, 0.4],
    )
    assert mtf[4.0] == pytest.approx(1.0)
    assert mtf[2.0] == pytest.approx(0.6, rel=1e-6)
    assert mtf[1.0] == pytest.approx(0.2, rel=1e-6)

    # workflow-level convention: keys are lp/mm frequencies, normalised to
    # the COARSEST pattern (regression: passing frequencies into
    # calculate_mtf inverted the normalisation, r4 mtf.json v1)
    from cbctmc_tpu.pipeline.mtf_workflow import mtf_from_line_pair_stats

    report = mtf_from_line_pair_stats(
        line_gaps=[1.0, 2.0, 4.0],
        maxima=[0.6, 0.8, 1.0],
        minima=[0.4, 0.2, 0.0],
    )
    # coarsest gap=4 -> frequency 1/8 lp/mm is the normalisation anchor
    assert report[1.0 / 8.0] == pytest.approx(1.0)
    assert report[1.0 / 2.0] == pytest.approx(0.2, rel=1e-6)
    assert all(v <= 1.0 + 1e-9 for v in report.values())

    # synthetic line-pair profile image
    profile = 0.5 + 0.5 * np.sin(np.linspace(0, 6 * np.pi, 90))
    image = np.tile(profile[:, None, None], (1, 8, 8))
    prof, maxs, mins = extract_line_pair_profile(
        image, (slice(None), slice(None), slice(None))
    )
    assert len(maxs) >= 2 and len(mins) >= 2


def test_demons_recovers_translation():
    from cbctmc_tpu.registration.demons import (
        DemonsParameters,
        register,
        warp_volume,
    )
    import jax.numpy as jnp

    shape = (32, 32, 32)
    coords = np.indices(shape).astype(np.float32)
    blob = lambda c: np.exp(
        -(((coords[0] - c[0]) ** 2 + (coords[1] - c[1]) ** 2 +
           (coords[2] - c[2]) ** 2) / 30.0)
    )
    fixed = blob((16, 16, 16))
    moving = blob((19, 16, 16))  # shifted by +3 in x

    dvf = register(
        moving, fixed,
        DemonsParameters(iterations=60, n_levels=2, tau=2.0),
    )
    warped = np.asarray(warp_volume(jnp.asarray(moving), jnp.asarray(dvf)))

    err_before = np.abs(moving - fixed).mean()
    err_after = np.abs(warped - fixed).mean()
    assert err_after < 0.35 * err_before
    # recovered displacement near the blob centre ~ +3 voxels in x
    assert dvf[0, 14:19, 14:19, 14:19].mean() == pytest.approx(3.0, abs=1.2)
    assert abs(dvf[1, 14:19, 14:19, 14:19].mean()) < 1.0


def test_demons_masked_and_jacobian():
    """Masked registration confines forces to the mask; the Jacobian guard
    keeps the transform fold-free (reference: masked vroc registration,
    cbctmc/registration/correspondence.py:325-330)."""
    import jax.numpy as jnp

    from cbctmc_tpu.registration.demons import (
        DemonsParameters,
        jacobian_determinant,
        register,
        warp_volume,
    )

    rng = np.random.default_rng(3)
    shape = (24, 24, 24)
    base = np.zeros(shape, np.float32)
    base[8:16, 8:16, 8:16] = 1.0
    base += rng.normal(scale=0.01, size=shape).astype(np.float32)
    moved = np.roll(base, 2, axis=0)

    mask = np.zeros(shape, np.float32)
    mask[4:20, 4:20, 4:20] = 1.0

    params = DemonsParameters(iterations=60, n_levels=2)
    dvf = register(moving=base, fixed=moved, parameters=params,
                   moving_mask=mask, fixed_mask=mask)
    warped = np.asarray(warp_volume(jnp.asarray(base), jnp.asarray(dvf)))
    err_before = np.abs(base - moved).mean()
    err_after = np.abs(warped - moved).mean()
    assert err_after < 0.5 * err_before

    # fold-free transform
    det = np.asarray(jacobian_determinant(jnp.asarray(dvf)))
    assert det.min() > 0.0

    # identity field has unit Jacobian
    det0 = np.asarray(jacobian_determinant(jnp.zeros((3, 8, 8, 8))))
    np.testing.assert_allclose(det0, 1.0, atol=1e-6)
