"""Tests for utils, datasets, WPC fit and evaluation workflows."""

import numpy as np
import pytest

from cbctmc_tpu.utils.common import (
    crop_or_pad,
    dict_collate,
    get_robust_bounding_box_3d,
    iec61217_to_rsp,
    nearest_factor_pow_2,
    rescale_range,
)
from cbctmc_tpu.utils.logging import FancyFormatter, LoggerMixin, init_fancy_logging


def test_rescale_range():
    out = rescale_range(np.array([-1024.0, 3071.0]), (-1024, 3071), (0, 1))
    np.testing.assert_allclose(out, [0.0, 1.0])
    out = rescale_range(np.array([-2000.0]), (-1024, 3071), (0, 1), clip=True)
    assert out[0] == 0.0


def test_crop_or_pad():
    img = np.arange(27).reshape(3, 3, 3)
    out = crop_or_pad(img, (5, 3, 1), pad_value=-1)
    assert out.shape == (5, 3, 1)
    assert out[0, 0, 0] == -1  # padded region
    np.testing.assert_array_equal(out[1:4, :, 0], img[:, :, 1])


def test_nearest_factor_pow_2():
    assert nearest_factor_pow_2(250) == 256
    assert nearest_factor_pow_2(100) in (112, 128, 108, 100)
    assert nearest_factor_pow_2(1) >= 1


def test_dict_collate():
    batch = [{"a": np.ones(2), "b": "x"}, {"a": np.zeros(2), "b": "y"}]
    out = dict_collate(batch, exclude_keys=("b",))
    assert out["a"].shape == (2, 2)
    assert out["b"] == ["x", "y"]


def test_robust_bbox():
    img = np.zeros((10, 10, 10))
    img[2:5, 3:7, 4:6] = 1.0
    sl = get_robust_bounding_box_3d(img)
    assert sl[0].start >= 1 and sl[0].stop <= 6
    assert sl[1].start >= 2 and sl[1].stop <= 8


def test_iec61217_to_rsp():
    vol = np.zeros((2, 3, 4))
    vol[0, 1, 2] = 7.0
    out = iec61217_to_rsp(vol)
    assert out.shape == (2, 4, 3)
    # y/z swapped, new y reversed
    assert out[0, 4 - 1 - 2, 1] == 7.0


def test_fancy_logging(capsys):
    import logging

    init_fancy_logging(level=logging.INFO, max_message_length=20)

    class Thing(LoggerMixin):
        pass

    Thing().logger.info("a" * 50)  # truncated, must not raise
    fmt = FancyFormatter(max_message_length=10, colors=False)
    record = logging.LogRecord("n", logging.INFO, "p", 1, "b" * 50, (), None)
    assert fmt.format(record).endswith("...")


def test_speedup_dataset(tmp_path):
    from cbctmc_tpu.models.datasets import (
        SpeedupProjectionDataset,
        create_speedup_training_example,
    )

    rng = np.random.default_rng(0)
    for i in range(3):
        create_speedup_training_example(
            rng.random((64, 48)), rng.random((64, 48)), rng.random((64, 48)),
            tmp_path, stem=f"projection_{i:03d}",
        )
    ds = SpeedupProjectionDataset(tmp_path, batch_size=2, patch_shape=(32, 32))
    batch = next(iter(ds))
    assert batch["input"].shape == (2, 32, 32, 2)
    assert batch["target"].shape == (2, 32, 32, 1)


def test_segmentation_dataset():
    from cbctmc_tpu.models.datasets import SegmentationPatchDataset

    rng = np.random.default_rng(1)
    image = rng.normal(0, 300, (40, 40, 40)).astype(np.float32)
    labels = np.zeros((9, 40, 40, 40), np.float32)
    labels[0] = 1.0
    labels[6, 10:20, 10:20, 10:20] = 1.0
    labels[0, 10:20, 10:20, 10:20] = 0.0

    ds = SegmentationPatchDataset(
        images=[image], labels=[labels], patch_shape=(16, 16, 16), batch_size=2,
    )
    batch = next(iter(ds))
    assert batch["input"].shape == (2, 16, 16, 16, 1)
    assert batch["target"].shape == (2, 16, 16, 16, 9)
    assert batch["input"].min() >= 0.0 and batch["input"].max() <= 1.0


def test_wpc_fit_synthetic():
    """A synthetic beam-hardened cylinder: the fit must recover coefficients
    that linearise the ROI means to their targets."""
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid
    from cbctmc_tpu.recon.joseph import project_forward
    from cbctmc_tpu.pipeline.wpc_fit import (
        fit_wpc_coefficients,
        reconstruct_projection_powers,
    )

    mu = 0.02
    n = 48
    coords = (np.arange(n) - (n - 1) / 2) * 4.0
    x, y = np.meshgrid(coords, coords, indexing="ij")
    vol = np.repeat(((x**2 + y**2 <= 60.0**2) * mu).astype(np.float32)[:, :, None], 4, 2)

    geom = ConeBeamGeometry(
        sad=400.0, sdd=600.0, n_pixels_u=64, n_pixels_v=4,
        pixel_size_u=6.0, pixel_size_v=8.0, detector_offset_u=0.0,
    )
    angles = 270.0 + np.arange(24) * 15.0
    ideal = project_forward(vol, geom, angles, volume_spacing=(4.0,) * 3, step_mm=2.0)
    # beam hardening: measured p = ideal - 0.05 * ideal^2 (saturating)
    hardened = ideal - 0.05 * ideal**2

    grid = VolumeGrid(shape=(48, 48, 4), spacing=(4.0,) * 3)
    powers = reconstruct_projection_powers(hardened, geom, angles, grid, n_orders=3)

    rr = np.sqrt(x**2 + y**2)
    mask = np.zeros((48, 48, 4), bool)
    mask[..., 2] = rr < 40.0
    coeff = fit_wpc_coefficients(powers, {"water": mask}, {"water": mu})
    corrected = np.tensordot(coeff, powers, axes=1)
    assert corrected[mask].mean() == pytest.approx(mu, rel=0.02)
    # and it beats the uncorrected recon
    assert abs(corrected[mask].mean() - mu) < abs(powers[1][mask].mean() - mu)


def test_evaluation_helpers():
    from cbctmc_tpu.pipeline.evaluation import calibrate_geometry, evaluate_speedup

    rng = np.random.default_rng(2)
    ref = rng.random((4, 16, 16))
    noisy = ref + rng.normal(0, 0.2, ref.shape)
    denoised = ref + rng.normal(0, 0.05, ref.shape)
    out = evaluate_speedup(denoised, ref, low_photon=noisy)
    assert out["psnr_gain"] > 5.0
    assert out["ncc_denoised"] > out["ncc_low"]

    target_offset = (1.0, 0.0, 0.0)

    def fake_sim(src_off, sdd_off, sad_off):
        err = sum((a - b) ** 2 for a, b in zip(src_off, target_offset))
        return ref + err * 1.0 + rng.normal(0, 1e-3, ref.shape)

    result = calibrate_geometry(
        fake_sim, ref,
        source_offsets=[(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (2.0, 0.0, 0.0)],
    )
    assert result["best"]["source_position_offset"] == (1.0, 0.0, 0.0)


def test_bin_detector():
    from cbctmc_tpu.engine.simulate import bin_detector

    a = np.arange(2 * 6 * 8, dtype=np.float64).reshape(2, 6, 8)
    out = bin_detector(a, 2)
    assert out.shape == (2, 3, 4)
    # average pooling: each output is the mean of its 2x2 block
    assert out[0, 0, 0] == pytest.approx(a[0, :2, :2].mean())
    assert out[1, 2, 3] == pytest.approx(a[1, 4:6, 6:8].mean())
    # factor 1 is the identity; energy (mean x area) is conserved
    assert bin_detector(a, 1) is a
    assert out.mean() == pytest.approx(a.mean())
    # non-divisible sizes crop the trailing rows/columns
    assert bin_detector(np.ones((5, 7)), 2).shape == (2, 3)


def test_noise_fit_law():
    from cbctmc_tpu.pipeline.noise_fit import fit_noise_law

    rng = np.random.default_rng(3)
    a_true, c_true = 5.0, 1e-4
    counts = np.array([1e8, 2e8, 4e8, 8e8, 1.6e9])
    stds = a_true / np.sqrt(counts) + c_true + rng.normal(0, 1e-7, len(counts))
    a, c = fit_noise_law(counts, stds)
    assert a == pytest.approx(a_true, rel=0.02)
    assert c == pytest.approx(c_true, rel=0.1)
    # solving for the count that hits a target std
    target = 2e-4
    n_star = (a / (target - c)) ** 2
    assert a / np.sqrt(n_star) + c == pytest.approx(target, rel=1e-6)


def test_kernel_census_parsing(tmp_path):
    import gzip, json

    from cbctmc_tpu.utils.profiling import kernel_census

    trace = {"traceEvents": [
        {"ph": "X", "dur": 100, "name": "fusion.1"},
        {"ph": "X", "dur": 50, "name": "fusion.1"},
        {"ph": "X", "dur": 30, "name": "copy.2"},
        {"ph": "M", "name": "meta"},
    ]}
    p = tmp_path / "x.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump(trace, f)
    rows = kernel_census(str(p))
    assert rows[0]["name"] == "fusion.1"
    assert rows[0]["total_ms"] == pytest.approx(0.15)
    assert rows[0]["count"] == 2


def test_rtk_geometry_xml_writer(tmp_path):
    """RTK geometry XML export (reference forward_projection.py:198-214):
    structure, parameter round-trip, and geometric invariants of the
    projection matrices."""
    import xml.etree.ElementTree as ET

    import numpy as np

    from cbctmc_tpu.recon.rtk_interop import (
        create_rtk_geometry,
        save_rtk_geometry_xml,
    )

    geom = create_rtk_geometry(n_projections=4, start_angle=270.0)
    path = save_rtk_geometry_xml(geom, tmp_path / "geometry.xml")
    text = path.read_text()
    assert "<!DOCTYPE RTKGEOMETRY>" in text

    root = ET.fromstring(text.replace("<!DOCTYPE RTKGEOMETRY>", ""))
    assert root.tag == "RTKThreeDCircularGeometry"
    assert float(root.find("SourceToIsocenterDistance").text) == 1000.0
    assert float(root.find("SourceToDetectorDistance").text) == 1500.0
    assert float(root.find("ProjectionOffsetX").text) == -159.856
    projections = root.findall("Projection")
    assert len(projections) == 4
    angles = [float(p.find("GantryAngle").text) for p in projections]
    assert angles == [270.0, 0.0, 90.0, 180.0]

    # matrix invariants: the isocenter projects to -projOffsetX in the
    # detector frame (principal ray through the detector centre offset),
    # and the source position is the matrix null direction
    matrices = geom.matrices()
    for i, ga in enumerate(geom.gantry_angles_deg):
        m = matrices[i]
        iso = m @ np.array([0.0, 0.0, 0.0, 1.0])
        assert iso[0] / iso[2] == pytest.approx(-geom.projection_offset_x)
        assert iso[1] / iso[2] == pytest.approx(0.0)
        # source in world coordinates: R^T (sox, soy, sid)
        g = np.radians(ga)
        ry = np.array([
            [np.cos(g), 0.0, np.sin(g)],
            [0.0, 1.0, 0.0],
            [-np.sin(g), 0.0, np.cos(g)],
        ])
        source_world = ry.T @ np.array([0.0, 0.0, geom.source_to_isocenter])
        proj = m @ np.append(source_world, 1.0)
        assert np.allclose(proj, 0.0, atol=1e-6)


def test_noise_fit_11_roi_deviation():
    """The deviation metric must average |std-ref|/ref over the reference's
    11 fit-noise ROIs (fit_noise.py:252-266)."""
    from cbctmc_tpu.pipeline.noise_fit import (
        NOISE_FIT_MATERIALS,
        variance_deviation,
    )
    from cbctmc_tpu.physics.reference_values import (
        REFERENCE_ROI_STATS_CATPHAN604_VARIAN as REF,
    )

    assert len(NOISE_FIT_MATERIALS) == 11
    exact = {m: {"std": REF[m]["std"]} for m in NOISE_FIT_MATERIALS}
    assert variance_deviation(exact) == pytest.approx(0.0)
    off = {m: {"std": REF[m]["std"] * 1.1} for m in NOISE_FIT_MATERIALS}
    assert variance_deviation(off) == pytest.approx(0.1, rel=1e-6)
