"""Unit tests for spectrum loading and Walker alias sampling."""

import numpy as np
import pytest

from cbctmc_tpu.physics.spectrum import Spectrum, build_walker_alias, default_spectrum


def test_default_spectrum_mean_energy():
    # The reference records 63.140 keV as the mean energy of the
    # 0.89 mm Ti spectrum (cbctmc/mc/reference.py:4) and uses the
    # varian_norm variant as default source spectrum.
    s = default_spectrum("125kVp_0.89mmTi")
    assert s.mean_energy == pytest.approx(63_140, rel=1e-3)

    s = default_spectrum()
    assert s.min_energy >= 5000.0
    assert s.max_energy <= 125_500.0


def test_walker_alias_reproduces_distribution():
    rng = np.random.default_rng(0)
    weights = rng.random(17) ** 2
    weights[3] = 0.0
    cutoff, alias = build_walker_alias(weights)

    n = len(weights)
    u = rng.random(400_000)
    rn = u * n
    int_part = rn.astype(int)
    frac = rn - int_part
    sampled = np.where(frac < cutoff[int_part], int_part, alias[int_part])

    freq = np.bincount(sampled, minlength=n) / len(sampled)
    expected = weights / weights.sum()
    np.testing.assert_allclose(freq, expected, atol=3e-3)
    assert freq[3] == 0.0


def test_walker_alias_single_bin():
    cutoff, alias = build_walker_alias(np.array([2.0]))
    assert alias[0] == 0


def test_spectrum_sampling_statistics():
    s = default_spectrum()
    rng = np.random.default_rng(1)
    n = 500_000
    u1 = rng.random(n)
    rn = u1 * s.n_bins
    int_part = rn.astype(int)
    frac = rn - int_part
    bins = np.where(frac < s.cutoff[int_part], int_part, s.alias[int_part])
    u2 = rng.random(n)
    energies = s.energies[bins] + u2 * (s.energies[bins + 1] - s.energies[bins])

    assert energies.mean() == pytest.approx(s.mean_energy, rel=2e-3)
    assert energies.min() >= s.min_energy
    assert energies.max() <= s.max_energy


def test_beer_lambert_filter():
    s = Spectrum(
        name="flat",
        energies=np.array([10e3, 20e3, 30e3], np.float32),
        probabilities=np.array([1.0, 1.0], np.float32),
    )
    mu_e = np.array([0.0, 100e3])
    mu = np.array([1.0, 1.0])  # 1/cm constant
    filtered = s.filter(mu_e, mu, thickness_cm=1.0)
    np.testing.assert_allclose(
        filtered.probabilities, np.exp(-1.0) * s.probabilities, rtol=1e-6
    )


def test_filter_spectrum_with_bundled_aluminium():
    from cbctmc_tpu.physics.spectrum import attenuation_curve, default_spectrum

    s = default_spectrum("125kVp_0.89mmTi")
    energies, mu = attenuation_curve("aluminium")
    filtered = s.filter(energies, mu, thickness_cm=0.2, name_suffix="_2mmAl")

    # filtering hardens the beam: mean energy increases, total flux drops
    assert filtered.mean_energy > s.mean_energy + 500
    assert filtered.probabilities.sum() < s.probabilities.sum()
    # low-energy bins attenuate far more than high-energy bins
    low, high = 20, -10
    ratio_low = filtered.probabilities[low] / max(s.probabilities[low], 1e-30)
    ratio_high = filtered.probabilities[high] / s.probabilities[high]
    assert ratio_low < ratio_high


def test_bowtie_derivation_matches_shipped_asset():
    """The bowtie subsystem must reconstruct the shipped pre-filtered
    spectrum from first principles: Varian-norm raw spectrum x Ti window x
    mean-half-bowtie aluminium (reference derivation,
    cbctmc/mc/spectrum.py:1366-1419). Agreement within 1% on all
    significant bins validates the extracted profile/mu data AND the
    Beer-Lambert construction."""
    import numpy as np

    from cbctmc_tpu.physics.spectrum import (
        bowtie_thickness_profile,
        default_spectrum,
        derive_filtered_spectrum,
    )

    profile = bowtie_thickness_profile("half")
    assert profile.shape == (900,)
    assert profile.mean() == pytest.approx(16.763, abs=0.01)  # "16.76mm Al"

    derived = derive_filtered_spectrum(125, 0.89, "half")
    shipped = default_spectrum("125kVp_0.89mmTi_half_bowtie_varian_norm")

    d = np.asarray(derived.probabilities, np.float64)
    d /= d.sum()
    s = np.asarray(shipped.probabilities, np.float64)
    s /= s.sum()
    # the shipped .spc starts at 5 keV; align by energy offset
    off = int(round((shipped.energies[0] - derived.energies[0]) / 1000.0))
    d = d[off : off + len(s)]
    significant = s > 0.01 * s.max()
    rel = np.abs(d[significant] - s[significant]) / s[significant]
    assert rel.max() < 0.01
    assert derived.mean_energy == pytest.approx(shipped.mean_energy, rel=0.002)

    # without the bowtie the construction must reproduce the plain
    # Ti-filtered default spectrum as well
    derived_ti = derive_filtered_spectrum(125, 0.89, bowtie=None)
    shipped_ti = default_spectrum("125kVp_0.89mmTi_varian_norm")
    d = np.asarray(derived_ti.probabilities, np.float64)
    d /= d.sum()
    s = np.asarray(shipped_ti.probabilities, np.float64)
    s /= s.sum()
    off = int(round((shipped_ti.energies[0] - derived_ti.energies[0]) / 1000.0))
    d = d[off : off + len(s)]
    significant = s > 0.01 * s.max()
    assert (np.abs(d[significant] - s[significant]) / s[significant]).max() < 0.01
