"""Unit tests for the material cross-section table layer."""

import numpy as np
import pytest

from cbctmc_tpu.physics.materials import (
    MATERIALS_125KEV_ORDER,
    build_woodcock_coefficients,
    default_material_set,
    linearize_inverse_mfp,
)


@pytest.fixture(scope="module")
def table_set():
    return default_material_set()


def test_material_numbers_and_order(table_set):
    # Material number = density-sorted position + 1 (parity with the
    # reference registry, cbctmc/mc/materials.py:112-119).
    assert tuple(table_set.identifiers) == MATERIALS_125KEV_ORDER
    assert table_set.material("air").number == 1
    assert table_set.material("h2o").number == 6
    assert table_set.material("aluminium").number == 22
    densities = table_set.densities
    assert (np.diff(densities) >= 0).all()


def test_energy_grid(table_set):
    assert table_set.e0 == pytest.approx(5000.0)
    assert table_set.de == pytest.approx(5.0)
    assert table_set.n_bins == 24001


def test_water_cross_sections_sane(table_set):
    """Total attenuation of water at ~60 keV should be ~0.2 /cm."""
    water = table_set.materials[table_set.index_of("h2o")]
    e = 60_000.0
    bin_idx = int((e - table_set.e0) / table_set.de)
    mu_total = 1.0 / water.mfp_total[bin_idx]
    assert 0.19 < mu_total < 0.22

    # total MFP is the harmonic sum of the partial MFPs
    mu_sum = (
        1.0 / water.mfp_rayleigh[bin_idx]
        + 1.0 / water.mfp_compton[bin_idx]
        + 1.0 / water.mfp_photoelectric[bin_idx]
    )
    assert mu_sum == pytest.approx(mu_total, rel=1e-3)


def test_linearized_inverse_mfp_matches_table(table_set):
    water = table_set.materials[table_set.index_of("h2o")]
    mfp = water.mfp_total[None]
    rho = np.array([water.density], np.float32)
    a, b = linearize_inverse_mfp(mfp, rho, table_set.e0, table_set.de)

    # exact reproduction at grid points (except the last, which extrapolates)
    for e in (5000.0, 60_000.0, 124_995.0):
        bin_idx = int((e - table_set.e0) / table_set.de)
        interp = a[0, bin_idx] + e * b[0, bin_idx]
        expected = 1.0 / (water.mfp_total[bin_idx] * water.density)
        assert interp == pytest.approx(expected, rel=1e-5)

    # halfway between grid points: linear interpolation of the inverse MFP
    e = 60_002.5
    bin_idx = int((e - table_set.e0) / table_set.de)
    interp = a[0, bin_idx] + e * b[0, bin_idx]
    lo = 1.0 / (water.mfp_total[bin_idx] * water.density)
    hi = 1.0 / (water.mfp_total[bin_idx + 1] * water.density)
    assert interp == pytest.approx(0.5 * (lo + hi), rel=1e-5)


def test_woodcock_table_is_majorant(table_set):
    """The Woodcock MFP must lower-bound every material's MFP scaled to the
    geometry's max density (majorant cross section)."""
    n_mats = table_set.n_materials
    max_density = np.zeros(n_mats, np.float32)
    max_density[table_set.index_of("air")] = 0.0012
    max_density[table_set.index_of("h2o")] = 1.0
    max_density[table_set.index_of("teflon")] = 2.16

    a, b = build_woodcock_coefficients(table_set, max_density)
    # evaluate at exact grid energies (between grid points the linear
    # interpolation may exceed the pointwise minimum by O(1e-3), as in the
    # reference engine)
    bins = np.linspace(1, table_set.n_bins - 2, 64).astype(int)
    energies = table_set.e0 + bins * table_set.de
    mfp_wc = a[bins] + energies * b[bins]
    assert (mfp_wc > 0).all()

    for identifier in ("h2o", "teflon"):
        m = table_set.materials[table_set.index_of(identifier)]
        scaled = m.mfp_total[bins] * m.density / max_density[table_set.index_of(identifier)]
        assert (mfp_wc <= scaled * (1 + 1e-4)).all()

    # teflon (densest, highest mu) should dominate the majorant
    teflon = table_set.materials[table_set.index_of("teflon")]
    scaled = teflon.mfp_total[bins] * teflon.density / 2.16
    np.testing.assert_allclose(mfp_wc, scaled, rtol=1e-3)


def test_compton_shells(table_set):
    water = table_set.materials[table_set.index_of("h2o")]
    # water has 4 oscillators totalling 10 electrons (H2O: Z sum = 10)
    assert water.n_shells == 4
    assert water.shell_f.sum() == pytest.approx(10.0)


def test_rita_tables(table_set):
    for m in table_set.materials:
        assert m.rita_x.shape == (128,)
        # cumulative probability is monotonically increasing from 0 to ~1
        assert m.rita_p[0] == pytest.approx(0.0)
        # the tabulated cumulative may slightly exceed 1 (<=1e-5) due to the
        # rational-fit construction; the sampler multiplies by pmax anyway
        assert m.rita_p[-1] == pytest.approx(1.0, abs=1e-5)
        assert (np.diff(m.rita_p) >= -1e-7).all()
        # limit tables are 1-based and within range
        assert m.rita_itl.min() >= 1 and m.rita_itu.max() <= 128


def test_shell_merge_preserves_scattering_function(table_set):
    """The shell merge in build_device_tables must keep both the electron
    count (S(E,pi) normalisation) and the full angular incoherent
    scattering function S(E, theta) within sub-percent of the raw-shell
    values (reference carries all 40 PENELOPE shells; MC-GPU_v1.3.h:62)."""
    from cbctmc_tpu.engine.tables import MAX_MERGED_SHELLS, _merge_shells

    def analytic_s(E, cdt1, f, ui, j0):
        mec2 = 510998.918
        e = np.asarray(E, np.float64)[..., None]
        c = np.asarray(cdt1, np.float64)[..., None]
        open_shell = ui[None] < e
        u = np.where(open_shell, ui[None], 0.0)
        aux = e * (e - u) * c
        pz = (
            j0[None] * (aux - u * mec2)
            / (np.sqrt(np.maximum(2 * aux + u * u, 1e-30)) * mec2)
        )
        t = (1 / np.sqrt(2) + np.abs(pz) * np.sqrt(2)) ** 2
        npz = 0.5 * np.exp(np.minimum(0.5 - t, 0.0))
        npz = np.where(pz > 0, 1 - npz, npz)
        return np.sum(np.where(open_shell, f[None] * npz, 0.0), axis=-1)

    energies = np.linspace(6e3, 125e3, 12)
    cdt1 = np.geomspace(1e-5, 2.0, 24)
    ee, cc = np.meshgrid(energies, cdt1, indexing="ij")
    for m in table_set.materials:
        f = np.asarray(m.shell_f, np.float64)
        ui = np.asarray(m.shell_ui, np.float64)
        j0 = np.asarray(m.shell_j0, np.float64)
        fm, um, jm = (
            np.asarray(a, np.float64)
            for a in _merge_shells(f, ui, j0, MAX_MERGED_SHELLS)
        )
        assert fm.sum() == pytest.approx(f.sum(), rel=1e-6), m.identifier
        assert len(fm) <= MAX_MERGED_SHELLS
        s_full = analytic_s(ee.ravel(), cc.ravel(), f, ui, j0)
        s_merged = analytic_s(ee.ravel(), cc.ravel(), fm, um, jm)
        s0 = analytic_s(energies, np.full_like(energies, 2.0), f, ui, j0)
        rel = np.abs(s_merged - s_full).reshape(12, 24) / s0[:, None]
        assert rel.max() < 2e-3, (m.identifier, rel.max())
