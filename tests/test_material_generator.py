"""Tests of the material-file generator against the shipped water tables."""

import numpy as np
import pytest

from cbctmc_tpu.physics.material_generator import (
    binary_search_limits,
    build_rita_table,
    compound_form_factor_squared,
    compound_shells,
    generate_material,
    parse_formula,
    write_mcgpu_file,
)
from cbctmc_tpu.physics.materials import default_material_set, parse_mcgpu_material_file


def test_parse_formula():
    assert parse_formula("H2O") == {"H": 2.0, "O": 1.0}
    assert parse_formula("C5H8O2") == {"C": 5.0, "H": 8.0, "O": 2.0}
    with pytest.raises(ValueError):
        parse_formula("Xx2")


def test_water_shells_match_shipped_table():
    shells = compound_shells("H2O")
    ts = default_material_set()
    water = ts.materials[ts.index_of("h2o")]
    assert len(shells) == water.n_shells == 4
    np.testing.assert_allclose(np.sort(shells[:, 0]), np.sort(water.shell_f))
    np.testing.assert_allclose(
        np.sort(shells[:, 1]), np.sort(water.shell_ui), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.sort(shells[:, 2]), np.sort(water.shell_j0), rtol=1e-4
    )


def test_water_form_factor_matches_shipped_pmax_shape():
    """The generated cumulative F^2 should track the shipped water table's
    pmax column (same normalisation over [0, 2*E_max])."""
    from scipy import integrate

    ts = default_material_set()
    water = ts.materials[ts.index_of("h2o")]
    energies = np.arange(5000.0, 125_005.0, 5.0)

    e_full = np.arange(0.0, 2 * 125_000.0 + 5.0, 5.0)
    x_full, ff2 = compound_form_factor_squared("H2O", e_full)
    norm = integrate.simpson(ff2, x=x_full**2)
    cum = integrate.cumulative_trapezoid(ff2 / norm, x_full**2, initial=0.0)
    pmax = np.interp(energies, e_full, cum)

    # compare at a few probe energies
    for e_probe in (20_000.0, 60_000.0, 120_000.0):
        i = int((e_probe - 5000.0) / 5.0)
        assert pmax[i] == pytest.approx(float(water.rayleigh_pmax[i]), rel=0.02)


def test_rita_table_reproduces_distribution():
    """Sampling from a generated RITA table must reproduce the pdf."""
    rng = np.random.default_rng(0)
    # an arbitrary smooth decaying pdf over x2
    x2 = np.linspace(0.0, 50.0, 20_001)
    pdf = np.exp(-x2 / 5.0) + 0.2 * np.exp(-(((np.sqrt(x2) - 3) ** 2)))
    x2g, cdfg, a, b = build_rita_table(x2, pdf, n_points=128)
    assert len(x2g) == 128
    assert cdfg[0] == 0.0 and cdfg[-1] == pytest.approx(1.0, abs=1e-9)
    assert (np.diff(cdfg) > 0).all()

    itl, itu = binary_search_limits(cdfg)
    assert (itl >= 1).all() and (itu <= 128).all() and (itl <= itu).all()

    # inverse-transform sample via the rational interpolation
    u = rng.random(200_000)
    idx = np.searchsorted(cdfg, u, side="right") - 1
    idx = np.clip(idx, 0, 126)
    rr = u - cdfg[idx]
    d = cdfg[idx + 1] - cdfg[idx]
    xx = x2g[idx] + (
        (a[idx] + 1.0 + b[idx]) * d * rr / (d * d + (a[idx] * d + b[idx] * rr) * rr)
    ) * (x2g[idx + 1] - x2g[idx])

    # compare sampled distribution against the exact cdf
    from scipy import integrate

    cdf_exact = integrate.cumulative_trapezoid(pdf, x2, initial=0)
    cdf_exact /= cdf_exact[-1]
    grid = np.linspace(0.0, 50.0, 200)
    empirical = np.searchsorted(np.sort(xx), grid) / len(xx)
    exact = np.interp(grid, x2, cdf_exact)
    assert np.abs(empirical - exact).max() < 0.01


def test_generate_and_reparse_material(tmp_path):
    """Full round trip with a synthetic attenuation source."""

    def fake_mu(z, energies, kind):
        e = np.asarray(energies, np.float64)
        base = {"coh": 0.1, "incoh": 0.15, "photo": 3.0, "total": 0.0}[kind]
        if kind == "photo":
            return base * z * (30_000.0 / e) ** 3
        if kind == "total":
            return (
                fake_mu(z, e, "coh") + fake_mu(z, e, "incoh") + fake_mu(z, e, "photo")
            )
        return base * np.ones_like(e)

    material = generate_material(
        "testwater", "H2O", density=1.0, e_max=30_000.0, mu_rho_fn=fake_mu
    )
    path = write_mcgpu_file(material, tmp_path / "testwater__5_30kev.mcgpu")
    parsed = parse_mcgpu_material_file(path)
    assert parsed.n_shells == 4
    assert parsed.n_bins == len(material.energies)
    np.testing.assert_allclose(parsed.mfp_total, material.mfp[3], rtol=1e-6)
    np.testing.assert_allclose(parsed.rita_x, material.rita[0], rtol=1e-6)
    assert (np.diff(parsed.rayleigh_pmax) >= 0).all()
