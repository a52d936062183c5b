"""Distribution tests: vectorized masked samplers vs sequential scalar
reference implementations of the same PENELOPE-2006 algorithms."""

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


def max_cdf_distance(a, b):
    """Two-sample Kolmogorov-Smirnov statistic."""
    grid = np.sort(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    cb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    return np.abs(ca - cb).max()


@pytest.mark.parametrize(
    "energy_kev",
    [
        pytest.param(20.0, marks=pytest.mark.slow),
        60.0,
        pytest.param(120.0, marks=pytest.mark.slow),
    ],
)
def test_compton_matches_scalar_reference(table_set, tables, energy_kev):
    mat_idx = table_set.index_of("h2o")
    water = table_set.materials[mat_idx]
    energy = energy_kev * 1e3

    n = 40_000
    e = jnp.full((n,), energy, jnp.float32)
    m = jnp.full((n,), mat_idx, jnp.int32)
    ebin = jnp.full((n,), int((energy - table_set.e0) / table_set.de), jnp.int32)
    new_e, costh = samplers.compton_scatter(
        jax.random.PRNGKey(0), e, m, ebin, tables, jnp.ones((n,), bool)
    )
    new_e = np.asarray(new_e)
    costh = np.asarray(costh)

    shells = list(zip(water.shell_f, water.shell_ui, water.shell_j0))
    rng = np.random.default_rng(1)
    ref = np.array([compton_scalar(rng, energy, shells) for _ in range(20_000)])
    ref_e, ref_costh = ref[:, 0], ref[:, 1]

    # energy conservation and kinematic limits (Doppler broadens slightly)
    assert (new_e <= energy + 1e-3).all()
    assert (costh >= -1.0).all() and (costh <= 1.0).all()

    assert max_cdf_distance(costh, ref_costh) < 0.02
    assert max_cdf_distance(new_e, ref_e) < 0.02
    assert np.mean(new_e) == pytest.approx(np.mean(ref_e), rel=5e-3)


@pytest.mark.parametrize(
    "energy_kev",
    [
        pytest.param(20.0, marks=pytest.mark.slow),
        60.0,
        pytest.param(120.0, marks=pytest.mark.slow),
    ],
)
@pytest.mark.parametrize(
    "material", ["h2o", pytest.param("bone_100", marks=pytest.mark.slow)]
)
def test_rayleigh_matches_scalar_reference(table_set, tables, energy_kev, material):
    mat_idx = table_set.index_of(material)
    m_tab = table_set.materials[mat_idx]
    energy = energy_kev * 1e3
    ebin = int((energy - table_set.e0) / table_set.de)

    n = 40_000
    e = jnp.full((n,), energy, jnp.float32)
    m = jnp.full((n,), mat_idx, jnp.int32)
    costh = samplers.rayleigh_scatter(
        jax.random.PRNGKey(2),
        e,
        m,
        jnp.full((n,), ebin, jnp.int32),
        tables,
        jnp.ones((n,), bool),
    )
    costh = np.asarray(costh)

    rita = {
        "x": m_tab.rita_x,
        "p": m_tab.rita_p,
        "a": m_tab.rita_a,
        "b": m_tab.rita_b,
        "itl": m_tab.rita_itl,
        "itu": m_tab.rita_itu,
    }
    pmax = float(m_tab.rayleigh_pmax[ebin + 1])
    rng = np.random.default_rng(3)
    ref = np.array([rayleigh_scalar(rng, energy, rita, pmax) for _ in range(20_000)])

    assert (costh >= -1.0).all() and (costh <= 1.0).all()
    assert max_cdf_distance(costh, ref) < 0.02
    # Rayleigh is forward peaked at high energy
    if energy_kev >= 60:
        assert np.mean(costh) > 0.5


def test_rotation_preserves_norm_and_angle():
    n = 10_000
    rng = np.random.default_rng(4)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    costh = rng.uniform(-1, 1, n).astype(np.float32)
    phi = rng.uniform(0, 2 * np.pi, n).astype(np.float32)

    nx, ny, nz = samplers.rotate_direction(
        jnp.asarray(d[:, 0], jnp.float32),
        jnp.asarray(d[:, 1], jnp.float32),
        jnp.asarray(d[:, 2], jnp.float32),
        jnp.asarray(costh),
        jnp.asarray(phi),
    )
    out = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], axis=1)

    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    dots = np.sum(out * d, axis=1)
    np.testing.assert_allclose(dots, costh, atol=1e-4)


def test_rotation_degenerate_pole():
    # dz = +-1 uses the dedicated branch
    nx, ny, nz = samplers.rotate_direction(
        jnp.zeros((2,)), jnp.zeros((2,)), jnp.array([1.0, -1.0]),
        jnp.array([0.5, 0.5]), jnp.array([0.3, 0.3]),
    )
    out = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], 1)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)
    assert out[0, 2] == pytest.approx(0.5, abs=1e-6)
    assert out[1, 2] == pytest.approx(-0.5, abs=1e-6)


def test_source_direction_square_field(tables):
    from cbctmc_tpu.engine.ct import ScanGeometry, build_scan

    geom = ScanGeometry(
        n_pixels_x=64, n_pixels_z=64,
        detector_size_x=40.0, detector_size_z=30.0,
        sdd=150.0, sad=100.0,
        aperture_phi1=-1.0, aperture_phi2=-1.0, aperture_theta=-1.0,
        source_position_0=(0.0, -100.0, 0.0),
    )
    source, _ = build_scan(geom, [270.0])
    src0 = jax.tree.map(lambda x: jnp.asarray(x[0]), source)

    n = 50_000
    dx, dy, dz, ok = samplers.sample_source_direction(jax.random.PRNGKey(5), src0, n)
    dx, dy, dz, ok = map(np.asarray, (dx, dy, dz, ok))
    assert ok.mean() > 0.99

    # direction (0,1,0): square field means |dz/dy| <= tan(theta/2) and
    # |dx/dy| <= tan(phi/2)
    tan_half_theta = 0.5 * 30.0 / 150.0
    tan_half_phi = 0.5 * 40.0 / 150.0
    sel = ok
    assert (np.abs(dz[sel] / dy[sel]) <= tan_half_theta * 1.001).all()
    assert (np.abs(dx[sel] / dy[sel]) <= tan_half_phi * 1.01).all()
    # field is filled out to the corners
    assert np.abs(dz[sel] / dy[sel]).max() > tan_half_theta * 0.95
    np.testing.assert_allclose(dx**2 + dy**2 + dz**2, 1.0, atol=1e-5)


def test_spectrum_energy_sampler(tables):
    n = 200_000
    e = samplers.sample_spectrum_energy(jax.random.PRNGKey(6), tables, n)
    e = np.asarray(e)
    spectrum = default_spectrum()
    assert e.mean() == pytest.approx(spectrum.mean_energy, rel=3e-3)
    assert e.min() >= spectrum.min_energy
    assert e.max() <= spectrum.max_energy
