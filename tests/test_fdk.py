"""Forward-projector and FDK reconstruction tests against analytic scenes."""

import numpy as np
import pytest

from cbctmc_tpu.recon.fdk import apply_water_precorrection, fdk_reconstruct
from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid
from cbctmc_tpu.recon.joseph import project_forward

MU = 0.02  # 1/mm (water-like)
R = 50.0  # cylinder radius [mm]


def make_cylinder(n=128, spacing=2.0, mu=MU, radius=R):
    """Cylinder of constant mu along z, centred on the isocenter."""
    coords = (np.arange(n) - (n - 1) / 2) * spacing
    x, y = np.meshgrid(coords, coords, indexing="ij")
    disk = (x**2 + y**2 <= radius**2).astype(np.float32) * mu
    vol = np.repeat(disk[:, :, None], 16, axis=2)
    return vol, spacing


GEOM = ConeBeamGeometry(
    sad=400.0, sdd=600.0,
    n_pixels_u=128, n_pixels_v=8,
    pixel_size_u=4.0, pixel_size_v=4.0,
    detector_offset_u=0.0,
)


def test_joseph_matches_analytic_chords():
    vol, spacing = make_cylinder()
    proj = project_forward(
        vol, GEOM, [270.0], volume_spacing=(spacing, spacing, spacing), step_mm=1.0
    )
    assert proj.shape == (1, 8, 128)
    row = proj[0, 4]  # central row

    # analytic chord length for a fan ray from source at (0,-sad,0) hitting
    # detector coordinate u: perpendicular distance of the ray to the origin
    u = GEOM.u_coordinates()
    s = np.abs(u) * GEOM.sad / np.sqrt(GEOM.sdd**2 + u**2)
    chord = 2.0 * np.sqrt(np.maximum(R**2 - s**2, 0.0))
    expected = MU * chord

    sel = chord > 20.0  # avoid grazing rays (voxelisation error dominates)
    np.testing.assert_allclose(row[sel], expected[sel], rtol=0.04)
    # rays missing the cylinder integrate (almost) nothing
    assert np.abs(row[chord == 0]).max() < MU * 2.5


def test_fdk_reconstructs_cylinder_mu():
    vol, spacing = make_cylinder()
    angles = np.arange(0.0, 360.0, 4.0) + 270.0
    proj = project_forward(
        vol, GEOM, angles, volume_spacing=(spacing, spacing, spacing), step_mm=1.0
    )
    grid = VolumeGrid(shape=(96, 96, 4), spacing=(2.0, 2.0, 2.0))
    recon = fdk_reconstruct(proj, GEOM, angles, grid=grid, hann=1.0, hann_y=0.0)

    coords = (np.arange(96) - 47.5) * 2.0
    x, y = np.meshgrid(coords, coords, indexing="ij")
    rr = np.sqrt(x**2 + y**2)
    center = recon[:, :, 2][rr < 30.0]
    outside = recon[:, :, 2][rr > 70.0]

    assert center.mean() == pytest.approx(MU, rel=0.03)
    assert np.abs(outside.mean()) < 0.05 * MU
    # uniformity inside the cylinder core
    assert center.std() < 0.05 * MU


def test_fdk_displaced_detector_half_fan():
    """Crop the projections to one side (offset detector) and reconstruct
    with displaced-detector weighting; mu must still be recovered."""
    vol, spacing = make_cylinder()
    angles = np.arange(0.0, 360.0, 4.0) + 270.0
    proj_full = project_forward(
        vol, GEOM, angles, volume_spacing=(spacing, spacing, spacing), step_mm=1.0
    )

    keep = 80  # keep low-u side: u in [-256, 64) mm
    proj_crop = proj_full[..., :keep]
    geom_crop = ConeBeamGeometry(
        sad=GEOM.sad, sdd=GEOM.sdd,
        n_pixels_u=keep, n_pixels_v=GEOM.n_pixels_v,
        pixel_size_u=GEOM.pixel_size_u, pixel_size_v=GEOM.pixel_size_v,
        detector_offset_u=-(128 - keep) / 2 * GEOM.pixel_size_u,
    )
    np.testing.assert_allclose(
        geom_crop.u_coordinates(), GEOM.u_coordinates()[:keep], atol=1e-6
    )

    grid = VolumeGrid(shape=(96, 96, 4), spacing=(2.0, 2.0, 2.0))
    recon = fdk_reconstruct(proj_crop, geom_crop, angles, grid=grid, hann=1.0,
                            hann_y=0.0)

    coords = (np.arange(96) - 47.5) * 2.0
    x, y = np.meshgrid(coords, coords, indexing="ij")
    rr = np.sqrt(x**2 + y**2)
    center = recon[:, :, 2][rr < 30.0]
    assert center.mean() == pytest.approx(MU, rel=0.05)
    assert center.std() < 0.08 * MU


def test_water_precorrection_polynomial():
    p = np.full((1, 2, 2), 2.0, np.float32)
    out = np.asarray(apply_water_precorrection(p, [1.0, 0.5, 0.25]))
    # 1 + 0.5*2 + 0.25*4 = 3
    np.testing.assert_allclose(out, 3.0, rtol=1e-6)


def test_fdk_view_chunking_matches_monolithic():
    """Streamed chunked backprojection (round-5 TPU-worker-crash fix) is
    numerically identical to a single-program reconstruction, including a
    ragged last chunk and a WPC polynomial with a constant term (padded
    zero views must not leak the order-0 coefficient into the volume)."""
    vol, spacing = make_cylinder(n=64)
    angles = np.arange(0.0, 360.0, 10.0) + 270.0  # 36 views
    proj = project_forward(
        vol, GEOM, angles, volume_spacing=(spacing, spacing, spacing),
        step_mm=2.0,
    )
    grid = VolumeGrid(shape=(48, 48, 4), spacing=(2.0, 2.0, 2.0))
    wpc = [0.05, 0.9, 0.02]
    ref = fdk_reconstruct(
        proj, GEOM, angles, grid=grid, water_precorrection=wpc,
        view_chunk=64,
    )
    chunked = fdk_reconstruct(
        proj, GEOM, angles, grid=grid, water_precorrection=wpc,
        view_chunk=10,  # 36 = 3 full chunks + ragged 6
    )
    np.testing.assert_allclose(chunked, ref, rtol=1e-5, atol=1e-7)
