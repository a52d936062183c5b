"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
from cbctmc_tpu.engine.tables import build_device_tables, build_woodcock_table
from cbctmc_tpu.engine.transport import EngineConfig, make_voxel_volume, run_projection
from cbctmc_tpu.parallel.sharded import (
    make_mesh,
    run_projection_sharded,
    run_scan_sharded,
    split_histories,
)
from cbctmc_tpu.physics.materials import default_material_set
from cbctmc_tpu.physics.spectrum import Spectrum

N_PIX = 16
CONFIG = EngineConfig(n_lanes=1 << 10, max_virtual_trips=4)


@pytest.fixture(scope="module")
def scene():
    table_set = default_material_set()
    spectrum = Spectrum(
        "mono60",
        np.array([59_995.0, 60_005.0], np.float32),
        np.array([1.0], np.float32),
    )
    tables = build_device_tables(table_set, spectrum)
    air = table_set.material("air")
    water = table_set.material("h2o")
    mats = np.full((16, 16, 16), air.number, np.uint8)
    dens = np.full((16, 16, 16), air.density, np.float32)
    mats[:, 6:10, :] = water.number
    dens[:, 6:10, :] = water.density
    max_density = np.zeros(table_set.n_materials, np.float32)
    np.maximum.at(max_density, mats.astype(int).reshape(-1) - 1, dens.reshape(-1))
    woodcock = build_woodcock_table(table_set, max_density)
    volume = make_voxel_volume(mats.astype(np.int32) - 1, dens, (1.25, 1.25, 1.25))
    geom = ScanGeometry(
        n_pixels_x=N_PIX, n_pixels_z=N_PIX,
        detector_size_x=20.0, detector_size_z=20.0,
        sdd=60.0, sad=40.0,
        aperture_phi1=-1.0, aperture_phi2=-1.0, aperture_theta=-1.0,
        source_position_0=(10.0, -30.0, 10.0),
    )
    return tables, woodcock, volume, geom


def test_split_histories():
    assert split_histories(10, 4).tolist() == [3, 3, 2, 2]
    assert split_histories(8, 4).tolist() == [2, 2, 2, 2]
    assert split_histories(10, 4).sum() == 10


def test_sharded_projection_matches_single_device_statistics(scene):
    tables, woodcock, volume, geom = scene
    source, detector = build_scan(geom, [270.0])
    src = jax.tree.map(lambda x: jnp.asarray(x[0]), source)
    det = jax.tree.map(lambda x: jnp.asarray(x[0]), detector)

    n_hist = 40_000
    mesh = make_mesh(n_proj_shards=1)
    assert mesh.shape["photons"] == 8

    img_sharded = np.asarray(
        run_projection_sharded(
            mesh, tables, woodcock, volume, src, det,
            n_hist, jax.random.PRNGKey(7),
            n_pixels_x=N_PIX, n_pixels_z=N_PIX, config=CONFIG,
        ),
        np.float64,
    )
    img_single = np.asarray(
        run_projection(
            tables, woodcock, volume, src, det,
            jnp.int32(n_hist), jax.random.PRNGKey(8),
            n_pixels_x=N_PIX, n_pixels_z=N_PIX, config=CONFIG,
        ),
        np.float64,
    )

    # same number of histories: totals agree statistically, never exceed
    # the emitted energy
    assert img_sharded.sum() <= n_hist * 60_005.0
    assert img_sharded.sum() == pytest.approx(img_single.sum(), rel=0.02)
    # per-pixel primary field agrees within counting noise
    mask = img_single[0] > 0
    rel = np.abs(img_sharded[0][mask] - img_single[0][mask]) / img_single[0][mask]
    assert np.median(rel) < 0.2


def test_scan_sharded_uneven_projection_split(scene):
    """n_projections=5 on 2 proj shards: the padded slot must not change
    the real projections (pad + zero-budget mask; VERDICT r2 item 8)."""
    tables, woodcock, volume, geom = scene
    angles = [270.0, 342.0, 54.0, 126.0, 198.0]
    source, detector = build_scan(geom, angles)
    source = jax.tree.map(jnp.asarray, source)
    detector = jax.tree.map(jnp.asarray, detector)

    mesh = make_mesh(n_proj_shards=2)
    images = run_scan_sharded(
        mesh, tables, woodcock, volume, source, detector,
        n_projections=5, n_histories_per_projection=5_000,
        key=jax.random.PRNGKey(3),
        n_pixels_x=N_PIX, n_pixels_z=N_PIX, config=CONFIG,
    )
    images = np.asarray(images, np.float64)
    assert images.shape == (5, 4, N_PIX, N_PIX)
    assert np.isfinite(images).all()
    assert (images.sum(axis=(1, 2, 3)) > 0).all()
    # energy conservation per projection: tallied <= emitted
    assert (images.sum(axis=(1, 2, 3)) <= 5_000 * 60_005.0).all()


@pytest.mark.slow
def test_scan_sharded_realistic_shapes():
    """Sharded scan at a realistic scene shape: 128^3 water cylinder, the
    real detector aspect (462x192 = full Varian 1848x768 at 1/4 scale),
    uneven 3-projection split on the 2x4 mesh (VERDICT r2 item 8: the
    sharded path had only ever run on 16^3 toys)."""
    from cbctmc_tpu.geometry.phantoms import WaterPhantomGeometry
    from cbctmc_tpu.physics.spectrum import default_spectrum

    table_set = default_material_set()
    tables = build_device_tables(table_set, default_spectrum())
    phantom = WaterPhantomGeometry(shape=(128, 128, 128), image_spacing=(2.0,) * 3)
    mats = np.ascontiguousarray(
        np.rot90(phantom.materials, k=3, axes=(0, 1))
    ).astype(np.int32) - 1
    dens = np.ascontiguousarray(np.rot90(phantom.densities, k=3, axes=(0, 1)))
    max_density = np.zeros(table_set.n_materials, np.float32)
    np.maximum.at(max_density, mats.reshape(-1), dens.reshape(-1))
    woodcock = build_woodcock_table(table_set, max_density)
    volume = make_voxel_volume(mats, dens, (0.2, 0.2, 0.2))

    half = 128 * 2.0 / 2 / 10.0
    geom = ScanGeometry(
        n_pixels_x=462, n_pixels_z=192,
        detector_size_x=71.7024, detector_size_z=29.7984,
        sdd=150.0, sad=100.0,
        aperture_phi1=1.481720423651376, aperture_phi2=13.441979314886868,
        aperture_theta=-1.0,
        source_position_0=(half, half - 100.0, half),
    )
    source, detector = build_scan(geom, [270.0, 30.0, 150.0])
    source = jax.tree.map(jnp.asarray, source)
    detector = jax.tree.map(jnp.asarray, detector)

    mesh = make_mesh(n_proj_shards=2)
    images = run_scan_sharded(
        mesh, tables, woodcock, volume, source, detector,
        n_projections=3, n_histories_per_projection=40_000,
        key=jax.random.PRNGKey(5),
        n_pixels_x=462, n_pixels_z=192,
        config=EngineConfig(n_lanes=1 << 12, max_virtual_trips=8),
    )
    images = np.asarray(images, np.float64)
    assert images.shape == (3, 4, 192, 462)
    assert np.isfinite(images).all()
    totals = images.sum(axis=(1, 2, 3))
    assert (totals > 0).all()
    # rotational symmetry of the centred cylinder: equal totals across views
    assert totals.max() / totals.min() < 1.1


def test_scan_sharded_2d_mesh(scene):
    tables, woodcock, volume, geom = scene
    angles = [270.0, 0.0, 90.0, 180.0]
    source, detector = build_scan(geom, angles)
    source = jax.tree.map(jnp.asarray, source)
    detector = jax.tree.map(jnp.asarray, detector)

    mesh = make_mesh(n_proj_shards=2)
    assert mesh.shape == {"proj": 2, "photons": 4}

    images = run_scan_sharded(
        mesh, tables, woodcock, volume, source, detector,
        n_projections=4, n_histories_per_projection=5_000,
        key=jax.random.PRNGKey(9),
        n_pixels_x=N_PIX, n_pixels_z=N_PIX, config=CONFIG,
    )
    images = np.asarray(images, np.float64)
    assert images.shape == (4, 4, N_PIX, N_PIX)
    assert np.isfinite(images).all()
    # every projection sees the beam
    assert (images.sum(axis=(1, 2, 3)) > 0).all()
    # opposing views of the symmetric slab have similar totals
    t = images.sum(axis=(1, 2, 3))
    assert t[0] == pytest.approx(t[2], rel=0.1)


@pytest.mark.slow
def test_sharded_scan_realistic_shapes():
    """Sharded scan at a realistic scene shape: 128^3 volume (2 mm), the
    real detector aspect (1848x768 scaled 4x to 462x192), an uneven
    projection split (3 projections over 2 proj shards exercises the
    pad+mask path), and the two-tier majorant volume (make_scene). The
    photon-axis psum total must agree with a single-device run of the same
    budget within statistics."""
    from cbctmc_tpu.engine.transport import make_scene
    from cbctmc_tpu.physics.spectrum import default_spectrum

    table_set = default_material_set()
    tables = build_device_tables(table_set, default_spectrum())

    n = 128
    air = table_set.material("air")
    water = table_set.material("h2o")
    teflon = table_set.material("teflon")
    mats = np.full((n, n, n), air.number, np.uint8)
    dens = np.full((n, n, n), air.density, np.float32)
    x, y = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    r2 = (x - n / 2) ** 2 + (y - n / 2) ** 2
    cyl = (r2 < (n * 0.35) ** 2)[..., None] & np.ones((1, 1, n), bool)
    mats[cyl] = water.number
    dens[cyl] = water.density
    ins = (r2 < (n * 0.08) ** 2)[..., None] & np.ones((1, 1, n), bool)
    mats[ins] = teflon.number
    dens[ins] = teflon.density
    volume, woodcock = make_scene(
        table_set, mats.astype(np.int32) - 1, dens, (0.2, 0.2, 0.2)
    )

    npx, npz = 462, 192  # 1848x768 / 4: real Varian aspect
    half = n * 0.2 / 2
    geom = ScanGeometry(
        n_pixels_x=npx, n_pixels_z=npz,
        detector_size_x=71.7024, detector_size_z=29.7984,
        sdd=150.0, sad=100.0,
        aperture_phi1=1.481720423651376, aperture_phi2=13.441979314886868,
        aperture_theta=-1.0,
        source_position_0=(half, half - 100.0, half),
    )
    angles = [270.0, 330.0, 30.0]
    source, detector = build_scan(geom, angles)
    source = jax.tree.map(jnp.asarray, source)
    detector = jax.tree.map(jnp.asarray, detector)

    config = EngineConfig(n_lanes=1 << 11, max_virtual_trips=8)
    mesh = make_mesh(n_proj_shards=2)
    n_hist = 24_000
    images = run_scan_sharded(
        mesh, tables, woodcock, volume, source, detector,
        n_projections=3, n_histories_per_projection=n_hist,
        key=jax.random.PRNGKey(3),
        n_pixels_x=npx, n_pixels_z=npz, config=config,
    )
    images = np.asarray(images, np.float64)
    assert images.shape == (3, 4, npz, npx)
    assert np.isfinite(images).all()
    assert (images.sum(axis=(1, 2, 3)) > 0).all()

    # single-device same-budget run of projection 0 for a statistical cross
    # check (different RNG streams; totals agree within MC noise)
    src0 = jax.tree.map(lambda v: jnp.asarray(v[0]), source)
    det0 = jax.tree.map(lambda v: jnp.asarray(v[0]), detector)
    single = run_projection(
        tables, woodcock, volume, src0, det0,
        jnp.int32(n_hist), jax.random.PRNGKey(17),
        n_pixels_x=npx, n_pixels_z=npz, config=config,
    )
    single = np.asarray(single, np.float64)
    assert images[0].sum() == pytest.approx(single.sum(), rel=0.05)
