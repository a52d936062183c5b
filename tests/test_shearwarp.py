"""Shear-warp MXU projector: agreement with the ray-marched Joseph
projector, analytic chord values, and exactness of the transpose."""

import numpy as np
import pytest

from cbctmc_tpu.recon.geometry import ConeBeamGeometry
from cbctmc_tpu.recon.joseph import project_forward
from cbctmc_tpu.recon.shearwarp import (
    ShearWarpProjector,
    _quarter_turn,
    shearwarp_project,
)

GEOM = ConeBeamGeometry(
    sad=400.0, sdd=600.0,
    n_pixels_u=96, n_pixels_v=16,
    pixel_size_u=4.0, pixel_size_v=4.0,
    detector_offset_u=0.0,
)

MU = 0.02
R = 50.0


def make_cylinder(n=96, spacing=2.0, nz=24):
    coords = (np.arange(n) - (n - 1) / 2) * spacing
    x, y = np.meshgrid(coords, coords, indexing="ij")
    disk = (x**2 + y**2 <= R**2).astype(np.float32) * MU
    return np.repeat(disk[:, :, None], nz, axis=2), spacing


def make_blob(n=64, nz=24, seed=0):
    """Smooth random scene (bandlimited) for projector cross-validation."""
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    vol = gaussian_filter(rng.normal(size=(n, n, nz)), sigma=3.0)
    # keep content inside the inscribed cylinder so rotation never clips
    coords = np.arange(n) - (n - 1) / 2
    x, y = np.meshgrid(coords, coords, indexing="ij")
    mask = (x**2 + y**2) <= (0.42 * n) ** 2
    return (vol * mask[:, :, None]).astype(np.float32)


def test_quarter_turn_rotates_content():
    """_quarter_turn(vol, 1) must equal sampling vol at R(+90 deg) p."""
    import jax.numpy as jnp

    n = 8
    vol = np.zeros((n, n, 1), np.float32)
    vol[6, 3, 0] = 1.0  # content at x-index 6, y-index 3
    out = np.asarray(_quarter_turn(jnp.asarray(vol), 1))
    # out[i, j] = vol at (x = -y_j, y = x_i) (centred indices):
    # content x0 = 6 - 3.5 = 2.5, y0 = 3 - 3.5 = -0.5 appears where
    # -y_j' = 2.5 wait: out(p') = vol(R(90)p'), R(90)(x', y') = (-y', x').
    # Need (-y', x') = (2.5, -0.5) -> x' = -0.5, y' = -2.5 ->
    # i = 3, j = 1.
    assert out[3, 1, 0] == 1.0
    assert out.sum() == 1.0


@pytest.mark.parametrize("angle", [270.0, 0.0, 90.0, 180.0, 310.0])
def test_shearwarp_matches_analytic_chords(angle):
    vol, spacing = make_cylinder()
    proj = shearwarp_project(
        vol, GEOM, [angle], volume_spacing=(spacing, spacing, spacing)
    )
    row = proj[0, 8]  # central row

    u = GEOM.u_coordinates()
    s = np.abs(u) * GEOM.sad / np.sqrt(GEOM.sdd**2 + u**2)
    chord = 2.0 * np.sqrt(np.maximum(R**2 - s**2, 0.0))
    expected = MU * chord

    sel = chord > 20.0
    np.testing.assert_allclose(row[sel], expected[sel], rtol=0.04)
    assert np.abs(row[chord == 0]).max() < MU * 2.5


@pytest.mark.parametrize(
    "angles",
    [[270.0], [271.5], [300.0], [315.0], [316.0], [45.0], [137.0],
     [0.0, 90.0, 180.0, 225.1]],
)
def test_shearwarp_matches_joseph(angles):
    """Cross-validate against the ray-marched projector on a smooth scene
    (both discretise the same integral; agreement to a few % of the max)."""
    vol = make_blob()
    sp = (2.0, 2.0, 2.0)
    ref = project_forward(vol, GEOM, angles, volume_spacing=sp, step_mm=0.5)
    got = shearwarp_project(vol, GEOM, angles, volume_spacing=sp)
    scale = np.abs(ref).max()
    assert scale > 0
    err = np.abs(got - ref).max() / scale
    assert err < 0.04, f"max rel-to-peak deviation {err:.4f}"


def test_shearwarp_adjoint_identity():
    """<A x, y> == <x, A^T y> to float32 round-off."""
    rng = np.random.default_rng(1)
    vol_shape = (40, 40, 12)
    angles = [270.0, 313.0, 17.0, 128.0, 222.0]
    geom = ConeBeamGeometry(
        sad=400.0, sdd=600.0, n_pixels_u=48, n_pixels_v=8,
        pixel_size_u=4.0, pixel_size_v=4.0, detector_offset_u=-20.0,
    )
    origin = -(np.asarray(vol_shape) - 1) / 2 * 2.0
    proj = ShearWarpProjector(vol_shape, origin, (2.0, 2.0, 2.0), geom, angles)
    x = rng.normal(size=vol_shape).astype(np.float32)
    y = rng.normal(size=(len(angles), 8, 48)).astype(np.float32)
    ax = np.asarray(proj.forward(x))
    aty = np.asarray(proj.transpose(y))
    lhs = float((ax * y).sum())
    rhs = float((x * aty).sum())
    assert abs(lhs - rhs) <= 2e-5 * max(abs(lhs), abs(rhs), 1e-30), (lhs, rhs)


def test_shearwarp_half_fan_offset_detector():
    """The laterally displaced detector (reference -159.856 mm analogue)
    projects correctly: compare to Joseph with the offset geometry."""
    vol = make_blob(n=48, nz=16)
    sp = (2.0, 2.0, 2.0)
    geom = ConeBeamGeometry(
        sad=400.0, sdd=600.0, n_pixels_u=64, n_pixels_v=8,
        pixel_size_u=4.0, pixel_size_v=4.0, detector_offset_u=-60.0,
    )
    angles = [270.0, 351.0, 84.3]
    ref = project_forward(vol, geom, angles, volume_spacing=sp, step_mm=0.5)
    got = shearwarp_project(vol, geom, angles, volume_spacing=sp)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 0.04, f"max rel-to-peak deviation {err:.4f}"
