"""Independent end-to-end oracle test: the vectorized transport engine vs a
complete scalar numpy re-implementation of the reference's history loop
(tests/scalar_reference.py::transport_oracle).

The oracle shares no engine code - spectrum sampling is direct CDF inversion
(not Walker alias), Woodcock tracking uses the plain global majorant (no
clearance pyramid / soft tier / candidate adoption), the samplers are the
sequential unbounded-rejection scalar forms, and shells are UN-merged - so
agreement of the 4-channel detector image within Monte-Carlo error validates
the engine's vectorisation, lane scheduling, table compression and tally
end-to-end. This is the in-repo substitute for cross-validating against the
MC-GPU binary (reference output contract: MC-GPU_v1.3.cu:2783-2953), which
needs a CUDA host that this environment does not have.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
from cbctmc_tpu.engine.tables import build_device_tables, build_woodcock_table
from cbctmc_tpu.engine.transport import (
    EngineConfig,
    make_voxel_volume,
    run_projection,
)
from cbctmc_tpu.physics.materials import default_material_set
from cbctmc_tpu.physics.spectrum import default_spectrum

from scalar_reference import transport_oracle

N_PIX = 32
CONFIG = EngineConfig(n_lanes=1 << 14, max_virtual_trips=8)


@pytest.fixture(scope="module")
def table_set():
    return default_material_set()


@pytest.fixture(scope="module")
def spectrum():
    return default_spectrum()


def _slab_scene(table_set):
    """20 cm air cube with a 5 cm water slab across the beam."""
    shape = (40, 40, 40)
    air = table_set.material("air")
    water = table_set.material("h2o")
    mats = np.full(shape, air.number, np.uint8)
    dens = np.full(shape, air.density, np.float32)
    mats[:, 15:25, :] = water.number
    dens[:, 15:25, :] = water.density
    return mats, dens


def _three_material_scene(table_set):
    """Water slab with an embedded bone block and an air pocket: exercises
    the multi-material branch probabilities and the dense-material majorant."""
    mats, dens = _slab_scene(table_set)
    bone = table_set.material("bone_100")
    mats[14:26, 17:23, 14:26] = bone.number
    dens[14:26, 17:23, 14:26] = bone.density
    air = table_set.material("air")
    mats[6:12, 17:23, 6:12] = air.number
    dens[6:12, 17:23, 6:12] = air.density
    return mats, dens


def _geometry():
    return ScanGeometry(
        n_pixels_x=N_PIX, n_pixels_z=N_PIX,
        detector_size_x=20.0, detector_size_z=20.0,
        sdd=60.0, sad=40.0,
        aperture_phi1=-1.0, aperture_phi2=-1.0, aperture_theta=-1.0,
        source_position_0=(10.0, 10.0 - 40.0, 10.0),
    )


def _run_engine(table_set, spectrum, mats, dens, n_histories, seed):
    tables = build_device_tables(table_set, spectrum)
    max_density = np.zeros(table_set.n_materials, np.float32)
    np.maximum.at(max_density, mats.astype(int).reshape(-1) - 1, dens.reshape(-1))
    woodcock = build_woodcock_table(table_set, max_density)
    volume = make_voxel_volume(mats.astype(np.int32) - 1, dens, (0.5, 0.5, 0.5))
    source, detector = build_scan(_geometry(), [270.0])
    src = jax.tree.map(lambda x: jnp.asarray(x[0]), source)
    det = jax.tree.map(lambda x: jnp.asarray(x[0]), detector)
    img = run_projection(
        tables, woodcock, volume, src, det,
        jnp.int32(n_histories), jax.random.PRNGKey(seed),
        n_pixels_x=N_PIX, n_pixels_z=N_PIX, config=CONFIG,
    )
    return np.asarray(img, np.float64)


def _run_oracle(table_set, spectrum, mats, dens, n_histories, seed):
    source, detector = build_scan(_geometry(), [270.0])
    src = jax.tree.map(lambda x: np.asarray(x[0]), source)
    det = jax.tree.map(lambda x: np.asarray(x[0]), detector)
    return transport_oracle(
        table_set, spectrum, mats, dens, (0.5, 0.5, 0.5),
        src, det, N_PIX, N_PIX, n_histories, seed=seed,
    )


def _compare(img_engine, n_engine, img_oracle, n_oracle):
    """Channel means per history must agree within the oracle's MC error.

    Tolerances are ~4 sigma of the oracle's per-channel counting statistics
    at the configured history counts (the engine runs ~10x more histories,
    so its own noise is a minor contribution)."""
    e = img_engine / n_engine
    o = img_oracle / n_oracle

    # total energy per history and per-channel means
    assert e.sum() == pytest.approx(o.sum(), rel=0.02)
    assert e[0].sum() == pytest.approx(o[0].sum(), rel=0.02)   # primary
    assert e[1].sum() == pytest.approx(o[1].sum(), rel=0.08)   # Compton
    assert e[2].sum() == pytest.approx(o[2].sum(), rel=0.20)   # Rayleigh
    if o[3].sum() > 0:
        assert e[3].sum() == pytest.approx(o[3].sum(), rel=0.30)  # multi

    # spatial agreement of the primary channel: 4x4 block profile
    # ~4 sigma at >=3.5k oracle primaries per block
    blocks_e = e[0].reshape(4, 8, 4, 8).sum(axis=(1, 3))
    blocks_o = o[0].reshape(4, 8, 4, 8).sum(axis=(1, 3))
    scale = blocks_o.max()
    np.testing.assert_allclose(
        blocks_e / scale, blocks_o / scale, atol=0.07,
    )


def test_oracle_water_slab(table_set, spectrum):
    """Water-slab scene, full 125 kVp spectrum: engine vs scalar oracle."""
    mats, dens = _slab_scene(table_set)
    img_o = _run_oracle(table_set, spectrum, mats, dens, 60_000, seed=101)
    img_e = _run_engine(table_set, spectrum, mats, dens, 400_000, seed=1)
    assert img_o.sum() > 0 and img_e.sum() > 0
    _compare(img_e, 400_000, img_o, 60_000)


@pytest.mark.slow
def test_oracle_three_materials(table_set, spectrum):
    """Three-material scene (water + bone + air pocket) at higher statistics:
    exercises the dense-material majorant, multi-material branching and the
    scatter channels."""
    mats, dens = _three_material_scene(table_set)
    img_o = _run_oracle(table_set, spectrum, mats, dens, 80_000, seed=202)
    img_e = _run_engine(table_set, spectrum, mats, dens, 1_000_000, seed=2)
    _compare(img_e, 1_000_000, img_o, 80_000)
