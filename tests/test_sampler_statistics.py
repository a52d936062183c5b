"""Statistical validation of the vectorized samplers (round-2 follow-up to
the trip-exhaustion review finding): measured exhaustion rates below 1e-5
and chi-square distribution agreement with the sequential scalar reference
implementations at large sample counts (sub-percent sensitivity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbctmc_tpu.engine import samplers
from cbctmc_tpu.engine.tables import build_device_tables
from cbctmc_tpu.physics.materials import default_material_set
from cbctmc_tpu.physics.spectrum import default_spectrum

from scalar_reference import compton_scalar, rayleigh_scalar


@pytest.fixture(scope="module")
def table_set():
    return default_material_set()


@pytest.fixture(scope="module")
def tables(table_set):
    return build_device_tables(table_set, default_spectrum())


def _compton_rows(table_set, tables, material, energy, n):
    mat_idx = table_set.index_of(material)
    e = jnp.full((n,), energy, jnp.float32)
    ebin = jnp.full(
        (n,), int((energy - table_set.e0) / table_set.de), jnp.int32
    )
    mat = jnp.full((n,), mat_idx, jnp.int32)
    s0 = tables.compton_s0[jnp.maximum(ebin, 0) * tables.n_mats + mat]
    return (
        e, s0,
        tables.shell_f[mat].T, tables.shell_ui[mat].T, tables.shell_j0[mat].T,
    )


@pytest.mark.parametrize(
    "material,energy_kev",
    [("h2o", 60.0), pytest.param("bone_100", 30.0, marks=pytest.mark.slow)],
)
def test_compton_exhaustion_below_1e5(table_set, tables, material, energy_kev):
    """With 12 tau trips the fraction of lanes that exhaust the rejection
    loop (and commit their last proposal) must be < 1e-5 - the v1 engine
    committed rejected proposals for ~0.4% of events."""
    n = 1_000_000
    e, s0, f, ui, j0 = _compton_rows(
        table_set, tables, material, energy_kev * 1e3, n
    )
    _, _, accepted = samplers.compton_scatter_rows(
        jax.random.PRNGKey(0), e, s0, f, ui, j0, jnp.ones((n,), bool),
        return_accepted=True,
    )
    exhausted = float(jnp.mean(~accepted))
    assert exhausted < 1e-5, exhausted


@pytest.mark.parametrize("material,energy_kev", [("h2o", 60.0)])
def test_rayleigh_exhaustion_below_1e5(table_set, tables, material, energy_kev):
    n = 1_000_000
    mat_idx = table_set.index_of(material)
    energy = energy_kev * 1e3
    ebin = int((energy - table_set.e0) / table_set.de)
    pmax = tables.rayleigh_pmax[(ebin + 1) * tables.n_mats + mat_idx]
    _, accepted = samplers.rayleigh_scatter_rows(
        jax.random.PRNGKey(1),
        jnp.full((n,), energy, jnp.float32),
        jnp.full((n,), mat_idx, jnp.int32),
        jnp.full((n,), pmax, jnp.float32),
        tables,
        jnp.ones((n,), bool),
        return_accepted=True,
    )
    exhausted = float(jnp.mean(~accepted))
    assert exhausted < 1e-5, exhausted


def _chi2_two_sample(a, b, n_bins=50):
    """Two-sample chi-square statistic per dof on common quantile bins."""
    edges = np.quantile(np.concatenate([a, b]), np.linspace(0, 1, n_bins + 1))
    edges[0] -= 1e-9
    edges[-1] += 1e-9
    o1, _ = np.histogram(a, edges)
    o2, _ = np.histogram(b, edges)
    k1 = np.sqrt(len(b) / len(a))
    k2 = 1.0 / k1
    keep = (o1 + o2) > 0
    chi2 = np.sum((k1 * o1[keep] - k2 * o2[keep]) ** 2 / (o1 + o2)[keep])
    dof = keep.sum() - 1
    return chi2 / dof


@pytest.mark.slow
@pytest.mark.parametrize("energy_kev", [60.0])
def test_compton_chi2_vs_scalar_reference(table_set, tables, energy_kev):
    """chi-square comparison at 2e6 vectorized vs 1e5 scalar samples: a
    sub-percent distributional bias in cos(theta) or E' shifts chi2/dof
    well above the acceptance band."""
    energy = energy_kev * 1e3
    n = 2_000_000
    e, s0, f, ui, j0 = _compton_rows(table_set, tables, "h2o", energy, n)
    new_e, costh = samplers.compton_scatter_rows(
        jax.random.PRNGKey(2), e, s0, f, ui, j0, jnp.ones((n,), bool)
    )
    new_e = np.asarray(new_e)
    costh = np.asarray(costh)

    water = table_set.materials[table_set.index_of("h2o")]
    shells = list(zip(water.shell_f, water.shell_ui, water.shell_j0))
    rng = np.random.default_rng(7)
    ref = np.array(
        [compton_scalar(rng, energy, shells) for _ in range(100_000)]
    )

    assert _chi2_two_sample(costh, ref[:, 1]) < 1.6
    assert _chi2_two_sample(new_e, ref[:, 0]) < 1.6


@pytest.mark.slow
@pytest.mark.parametrize("energy_kev", [60.0])
def test_rayleigh_chi2_vs_scalar_reference(table_set, tables, energy_kev):
    energy = energy_kev * 1e3
    mat_idx = table_set.index_of("h2o")
    ebin = int((energy - table_set.e0) / table_set.de)
    n = 2_000_000
    costh = samplers.rayleigh_scatter(
        jax.random.PRNGKey(3),
        jnp.full((n,), energy, jnp.float32),
        jnp.full((n,), mat_idx, jnp.int32),
        jnp.full((n,), ebin, jnp.int32),
        tables,
        jnp.ones((n,), bool),
    )
    costh = np.asarray(costh)

    m_tab = table_set.materials[mat_idx]
    rita = {
        "x": m_tab.rita_x, "p": m_tab.rita_p, "a": m_tab.rita_a,
        "b": m_tab.rita_b, "itl": m_tab.rita_itl, "itu": m_tab.rita_itu,
    }
    pmax = float(m_tab.rayleigh_pmax[ebin + 1])
    rng = np.random.default_rng(8)
    ref = np.array(
        [rayleigh_scalar(rng, energy, rita, pmax) for _ in range(100_000)]
    )
    assert _chi2_two_sample(costh, ref) < 1.6


def _tab_sample(tables, table_set, material, energy, n, seed=3):
    """Sample Compton (E', costh) via the tabulated inverse-CDF path the
    way the engine does it (stochastic energy-row pick + knot lerp)."""
    mat_idx = table_set.index_of(material)
    e = jnp.full((n,), energy, jnp.float32)
    mat = jnp.full((n,), mat_idx, jnp.int32)
    k_tau, k_shell = jax.random.split(jax.random.PRNGKey(seed))
    u2 = jax.random.uniform(k_tau, (2, n))
    # the SAME sampling path the engine event stage runs (shared helper)
    cdt1 = samplers.sample_compton_cdt1_tab(u2, e, mat, tables)
    new_e, costh = samplers.compton_scatter_rows_tab(
        k_shell, e, cdt1,
        tables.shell_f[mat].T, tables.shell_ui[mat].T, tables.shell_j0[mat].T,
        jnp.ones((n,), bool),
    )
    return np.asarray(new_e), np.asarray(costh)


@pytest.mark.parametrize(
    "material,energy_kev",
    [
        ("h2o", 60.0),
        ("h2o", 24.0),
        pytest.param("bone_100", 100.0, marks=pytest.mark.slow),
        pytest.param("aluminium", 40.0, marks=pytest.mark.slow),
    ],
)
def test_compton_tau_table_chi2_vs_analytic(table_set, tables, material,
                                            energy_kev):
    """The tabulated inverse-CDF angle sampler (engine v3.4b) must agree
    with the analytic GCOa rejection path: chi-square/dof on cos(theta)
    and E' over 50 quantile bins stays in the statistical band. A knot- or
    energy-grid resolution bias of ~1% would push chi2/dof >> 2."""
    energy = energy_kev * 1e3
    n = 400_000
    e, s0, f, ui, j0 = _compton_rows(table_set, tables, material, energy, n)
    ref_e, ref_c = samplers.compton_scatter_rows(
        jax.random.PRNGKey(5), e, s0, f, ui, j0, jnp.ones((n,), bool)
    )
    tab_e, tab_c = _tab_sample(tables, table_set, material, energy, n)
    chi_c = _chi2_two_sample(tab_c, np.asarray(ref_c))
    chi_e = _chi2_two_sample(tab_e, np.asarray(ref_e))
    assert chi_c < 2.0, chi_c
    assert chi_e < 2.0, chi_e
