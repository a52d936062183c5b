"""End-to-end pipeline tests: artifact layout of MCSimulation /
MCSimulation4D, projection IO round trip, reconstruction entry point."""

import numpy as np
import pytest

from cbctmc_tpu.engine.simulate import SimulationParameters
from cbctmc_tpu.engine.transport import EngineConfig
from cbctmc_tpu.geometry.mc_geometry import MCGeometry
from cbctmc_tpu.physics.materials import default_material_set
from cbctmc_tpu.pipeline.simulation import (
    MCSimulation,
    MCSimulation4D,
    _read_projection_stack,
    _write_projection_stack,
)


@pytest.fixture(scope="module")
def tiny_setup():
    ts = default_material_set()
    air = ts.material("air")
    water = ts.material("h2o")
    shape = (24, 24, 24)
    mats = np.full(shape, air.number, np.uint8)
    dens = np.full(shape, air.density, np.float32)
    mats[8:16, 8:16, 8:16] = water.number
    dens[8:16, 8:16, 8:16] = water.density
    geometry = MCGeometry(mats, dens, image_spacing=(8.0, 8.0, 8.0))

    params = SimulationParameters(
        n_histories=40_000,
        n_projections=2,
        angle_between_projections=180.0,
        n_detector_pixels=(32, 16),
        detector_size=(400.0, 200.0),
        source_polar_aperture=(-1.0, -1.0),
        source_azimuthal_aperture=-1.0,
    )
    config = EngineConfig(n_lanes=1 << 12, max_virtual_trips=4)
    return geometry, params, config


def test_projection_stack_io_roundtrip(tmp_path):
    stack = np.random.default_rng(0).random((3, 8, 16)).astype(np.float32)
    path = tmp_path / "projections_total.mha"
    _write_projection_stack(stack, path, (0.5, 0.5))
    loaded = _read_projection_stack(path)
    np.testing.assert_allclose(loaded, stack, rtol=1e-6)


def test_mc_simulation_artifacts(tmp_path, tiny_setup):
    geometry, params, config = tiny_setup
    sim = MCSimulation(
        geometry=geometry, parameters=params, engine_config=config,
        n_pixels_half_fan_x=24, air_n_histories=100_000,
    )
    artifacts = sim.run_simulation(
        tmp_path, run_air_simulation=True,
        air_projection_denoise_kernel_size=(2.0, 2.0),
    )
    for name in ("total", "unscattered", "scattered", "normalized"):
        assert artifacts[name].is_file(), name

    assert (tmp_path / "air" / "projections_total.mha").is_file()
    assert (tmp_path / "geometry_materials.nii.gz").is_file()
    assert (tmp_path / "geometry.pkl.gz").is_file()

    total = _read_projection_stack(artifacts["total"])
    assert total.shape == (2, 16, 24)
    assert (total >= 0).all() and total.sum() > 0

    normalized = _read_projection_stack(artifacts["normalized"])
    # Beer-Lambert line integrals: positive behind the water cube
    assert np.isfinite(normalized).all()
    assert normalized.max() > 0.5

    # idempotence: a second run is skipped
    assert sim.run_simulation(tmp_path) == {}


def test_mc_simulation_4d(tmp_path, tiny_setup):
    from cbctmc_tpu.pipeline.correspondence import CorrespondenceModel
    from cbctmc_tpu.pipeline.respiratory import RespiratorySignal

    geometry, params, config = tiny_setup

    # synthetic correspondence model: rigid x shift proportional to signal
    shape = geometry.image_shape
    t = 6
    signals = np.stack(
        [np.sin(np.linspace(0, 2 * np.pi, t, endpoint=False)),
         np.cos(np.linspace(0, 2 * np.pi, t, endpoint=False))]
    )
    fields = np.zeros((t, 3, *shape), np.float32)
    fields[:, 0] = signals[0][:, None, None, None] * 2.0
    model = CorrespondenceModel().fit(fields, signals, reference_phase=2)

    signal = RespiratorySignal.create_cos4(
        total_seconds=4.0, period=2.0, sampling_frequency=15.0
    )

    sim4d = MCSimulation4D(
        correspondence_model=model,
        geometry=geometry,
        parameters=params,
        engine_config=config,
        n_pixels_half_fan_x=24,
        air_n_histories=100_000,
    )
    artifacts = sim4d.run_simulation(
        respiratory_signal=signal,
        respiratory_signal_quantization=2,
        output_folder=tmp_path,
        air_projection_denoise_kernel_size=(2.0, 2.0),
    )
    assert artifacts["total"].is_file()
    assert (tmp_path / "signal.txt").is_file()
    assert (tmp_path / "signal_quantized.txt").is_file()
    assert (tmp_path / "projection_geometries.yaml").is_file()
    # warped geometries cached by signal hash
    assert list(tmp_path.glob("geometry_*.pkl.gz"))

    total = _read_projection_stack(artifacts["total"])
    assert total.shape == (2, 16, 24)
    assert (total.sum(axis=(1, 2)) > 0).all()


def test_reconstruction_entry_point(tmp_path):
    """recon entry point consumes the artifact stack format."""
    from cbctmc_tpu.pipeline.reconstruction import reconstruct_3d
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry
    from cbctmc_tpu.recon.joseph import project_forward

    # small analytic cylinder, projected and stored like a pipeline artifact
    n = 48
    coords = (np.arange(n) - (n - 1) / 2) * 4.0
    x, y = np.meshgrid(coords, coords, indexing="ij")
    vol = np.repeat(
        ((x**2 + y**2 <= 40.0**2) * 0.02).astype(np.float32)[:, :, None], 4, 2
    )
    geom = ConeBeamGeometry(
        sad=400.0, sdd=600.0, n_pixels_u=64, n_pixels_v=4,
        pixel_size_u=6.0, pixel_size_v=8.0, detector_offset_u=0.0,
    )
    angles = 270.0 + np.arange(24) * 15.0
    proj = project_forward(vol, geom, angles, volume_spacing=(4.0,) * 3, step_mm=2.0)
    # store with the artifact convention (flipped rows)
    _write_projection_stack(proj[:, ::-1, :], tmp_path / "projections.mha", (6.0, 8.0))

    out = reconstruct_3d(
        tmp_path / "projections.mha",
        dimension=(48, 4, 48),
        spacing=(4.0, 4.0, 4.0),
        geometry=geom,
        hann_y=0.0,
    )
    assert out.is_file()
    from cbctmc_tpu.utils.io import read_image

    recon, _ = read_image(out)
    assert recon.shape == (48, 48, 4)
    center = recon[20:28, 20:28, 2].mean()
    assert center == pytest.approx(0.02, rel=0.1)


def test_native_interchange_roundtrip(tmp_path):
    """Native C++ codecs and the MC-GPU geometry/input exporters."""
    from cbctmc_tpu import native
    from cbctmc_tpu.utils.interchange import (
        export_mcgpu_geometry,
        export_mcgpu_input,
    )
    import gzip

    rng = np.random.default_rng(0)
    mats = rng.integers(1, 23, (6, 5, 4)).astype(np.uint8)
    dens = (rng.random((6, 5, 4)) * 2.5).astype(np.float32)

    path = export_mcgpu_geometry(mats, dens, (0.1, 0.1, 0.1), tmp_path / "g.vox.gz")
    text = gzip.open(path, "rt").read()
    assert "[SECTION VOXELS HEADER" in text
    body = text.split("[END OF VXH SECTION]")[1]
    values = native.parse_ascii_floats(body, 10_000)
    assert len(values) == 2 * mats.size
    # x runs fastest in the file
    np.testing.assert_allclose(
        values[1::2].reshape(4, 5, 6).transpose(2, 1, 0), dens, atol=1e-6
    )
    np.testing.assert_array_equal(
        values[0::2].reshape(4, 5, 6).transpose(2, 1, 0).astype(np.uint8), mats
    )

    inp = export_mcgpu_input(
        tmp_path / "input.in",
        voxel_geometry_filepath=str(path),
        material_filepaths=["m1.mcgpu", "m2.mcgpu"],
        spectrum_filepath="spec.spc",
        output_folder=str(tmp_path),
        n_histories=1000,
        source_position_cm=(25.0, -75.0, 25.0),
        n_projections=4,
    )
    content = inp.read_text()
    for section in ("SIMULATION CONFIG", "SOURCE", "IMAGE DETECTOR",
                    "CT SCAN TRAJECTORY", "VOXELIZED GEOMETRY",
                    "MATERIAL FILE LIST"):
        assert section in content


def test_geometry_from_ct_with_provided_segmentations(tmp_path):
    """Patient workflow without DL weights: CT + segmentation masks ->
    material geometry through the default mapper pipeline."""
    from cbctmc_tpu.pipeline.patient import geometry_from_ct
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.utils.io import write_image

    rng = np.random.default_rng(0)
    shape = (20, 20, 20)
    ct = np.full(shape, -1000.0, np.float32)  # air
    body = np.zeros(shape, np.uint8)
    body[4:16, 4:16, 4:16] = 1
    ct[body > 0] = 40.0  # soft tissue HU
    bone = np.zeros(shape, np.uint8)
    bone[8:12, 8:12, 8:12] = 1
    ct[bone > 0] = 500.0
    lung = np.zeros(shape, np.uint8)
    lung[5:7, 5:7, 5:7] = 1
    ct[lung > 0] = -800.0

    ct_path = tmp_path / "ct.mha"
    write_image(ct, ct_path, spacing=(1.0, 1.0, 1.0))

    geometry = geometry_from_ct(
        ct_path,
        body_segmentation=body,
        bone_segmentation=bone,
        lung_segmentation=lung,
    )
    ts = default_material_set()
    assert geometry.materials.shape == shape
    # outside body -> air
    assert geometry.materials[0, 0, 0] == ts.material("air").number
    # inside bone mask with 500 HU -> bone_050 (plus bone_100 outline)
    bone_region = geometry.materials[8:12, 8:12, 8:12]
    assert set(np.unique(bone_region)).issubset(
        {ts.material("bone_050").number, ts.material("bone_100").number}
    )
    # lung voxels -> lung material
    assert geometry.materials[5, 5, 5] == ts.material("lung").number
    # body elsewhere -> soft tissue
    assert geometry.materials[14, 14, 14] == ts.material("soft_tissue").number


def test_forward_projection_4d(tmp_path, tiny_setup):
    """The 4D speedup input: per-angle forward projection of the WARPED
    geometry each projection was simulated with (reference:
    scripts/run_mc_simulations.py:491-556)."""
    # reuse the 4D simulation artifacts
    test_mc_simulation_4d(tmp_path, tiny_setup)

    from cbctmc_tpu.cli import _forward_project_geometry_4d
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry

    geometry, params, config = tiny_setup
    recon_geom = ConeBeamGeometry(
        n_pixels_u=24, n_pixels_v=16, pixel_size_u=16.0, pixel_size_v=16.0,
        detector_offset_u=0.0,
    )
    _forward_project_geometry_4d(
        tmp_path, n_projections=params.n_projections, recon_geometry=recon_geom
    )
    fp = _read_projection_stack(tmp_path / "density_fp_4d.mha")
    assert fp.shape == (params.n_projections, 16, 24)
    assert np.isfinite(fp).all()
    assert (fp.sum(axis=(1, 2)) > 0).all()
