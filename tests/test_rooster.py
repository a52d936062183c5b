"""4D ROOSTER reconstruction test on a tiny moving-cylinder scene."""

import numpy as np
import pytest

from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid
from cbctmc_tpu.recon.joseph import project_forward
from cbctmc_tpu.recon.rooster import (
    RoosterParameters,
    phase_interpolation_weights,
    rooster_reconstruct,
)

MU = 0.02
GEOM = ConeBeamGeometry(
    sad=400.0, sdd=600.0,
    n_pixels_u=64, n_pixels_v=4,
    pixel_size_u=6.0, pixel_size_v=8.0,
    detector_offset_u=0.0,
)


def make_cylinder(offset_x_mm: float, n=48, spacing=4.0):
    coords = (np.arange(n) - (n - 1) / 2) * spacing
    x, y = np.meshgrid(coords, coords, indexing="ij")
    disk = (((x - offset_x_mm) ** 2 + y**2) <= 40.0**2).astype(np.float32) * MU
    return np.repeat(disk[:, :, None], 4, axis=2)


def test_phase_interpolation_weights():
    w = phase_interpolation_weights(np.array([0.0, 0.25, 0.5, 0.95]), 4)
    np.testing.assert_allclose(w.sum(axis=1), 1.0)
    np.testing.assert_allclose(w[0], [1, 0, 0, 0])
    np.testing.assert_allclose(w[1], [0, 1, 0, 0])
    # 0.95 * 4 = 3.8 -> 0.2 on phase 3, 0.8 on phase 0 (cyclic)
    np.testing.assert_allclose(w[3], [0.8, 0, 0, 0.2], atol=1e-6)


def test_rooster_separates_motion_states():
    spacing = 4.0
    vol_a = make_cylinder(+16.0, spacing=spacing)
    vol_b = make_cylinder(-16.0, spacing=spacing)

    n_proj = 24
    angles = 270.0 + np.arange(n_proj) * 360.0 / n_proj
    # alternate motion states between consecutive projections
    proj_a = project_forward(vol_a, GEOM, angles[0::2],
                             volume_spacing=(spacing,) * 3, step_mm=2.0)
    proj_b = project_forward(vol_b, GEOM, angles[1::2],
                             volume_spacing=(spacing,) * 3, step_mm=2.0)
    projections = np.empty((n_proj, GEOM.n_pixels_v, GEOM.n_pixels_u), np.float32)
    projections[0::2] = proj_a
    projections[1::2] = proj_b
    phase = np.where(np.arange(n_proj) % 2 == 0, 0.0, 0.5)

    grid = VolumeGrid(shape=(48, 48, 4), spacing=(spacing,) * 3)
    volumes = rooster_reconstruct(
        projections, GEOM, angles, phase, grid=grid,
        parameters=RoosterParameters(
            n_phases=2, n_iterations=3, n_data_subiterations=2,
            n_tv_iterations=5, gamma_space=1e-5, gamma_time=1e-4,
            data_step_size=0.5,
        ),
    )
    assert volumes.shape == (2, 48, 48, 4)
    assert np.isfinite(volumes).all()

    # each phase's cylinder sits on its own side of the x axis
    right = volumes[:, 28:40, 18:30, 2].mean(axis=(1, 2))
    left = volumes[:, 8:20, 18:30, 2].mean(axis=(1, 2))
    assert right[0] > left[0] * 1.2
    assert left[1] > right[1] * 1.2


def _recon_error(projections, angles, phase, grid, spacing, vol_a, vol_b,
                 method, projector="joseph"):
    volumes = rooster_reconstruct(
        projections, GEOM, angles, phase, grid=grid,
        parameters=RoosterParameters(
            n_phases=2, n_iterations=3, n_data_subiterations=2,
            n_tv_iterations=5, gamma_space=1e-5, gamma_time=1e-4,
            data_step_size=0.5, data_method=method, projector=projector,
        ),
    )
    err = 0.0
    for vol, ref in ((volumes[0], vol_a), (volumes[1], vol_b)):
        err += float(np.sqrt(np.mean((vol - ref) ** 2)))
    return err, volumes


def test_rooster_cg_beats_landweber_at_equal_iterations():
    """The reference runs a conjugate-gradient data term (cgiter=4,
    cbctmc/reconstruction/reconstruction.py:105-121); with the matched
    linear-transpose adjoint, CG must converge faster than the Landweber
    fallback at the same sub-iteration count."""
    spacing = 4.0
    vol_a = make_cylinder(+16.0, spacing=spacing)
    vol_b = make_cylinder(-16.0, spacing=spacing)

    n_proj = 24
    angles = 270.0 + np.arange(n_proj) * 360.0 / n_proj
    proj_a = project_forward(vol_a, GEOM, angles[0::2],
                             volume_spacing=(spacing,) * 3, step_mm=2.0)
    proj_b = project_forward(vol_b, GEOM, angles[1::2],
                             volume_spacing=(spacing,) * 3, step_mm=2.0)
    projections = np.empty((n_proj, GEOM.n_pixels_v, GEOM.n_pixels_u), np.float32)
    projections[0::2] = proj_a
    projections[1::2] = proj_b
    phase = np.where(np.arange(n_proj) % 2 == 0, 0.0, 0.5)
    grid = VolumeGrid(shape=(48, 48, 4), spacing=(spacing,) * 3)

    err_cg, vols_cg = _recon_error(
        projections, angles, phase, grid, spacing, vol_a, vol_b, "cg"
    )
    err_lw, _ = _recon_error(
        projections, angles, phase, grid, spacing, vol_a, vol_b, "landweber"
    )
    assert np.isfinite(vols_cg).all()
    assert err_cg < err_lw * 0.9, (err_cg, err_lw)


def test_splat_adjoint_matches_transpose_and_ad():
    """The analytic splat adjoint must satisfy <Ax, y> = <x, A^T y>
    exactly (up to f32 rounding) and agree with reverse-mode AD of the
    ray-marching projector (the AD transpose is exact but stores
    O(rays * n_steps) scan residuals, which is why production uses the
    splat)."""
    import jax
    import jax.numpy as jnp

    from cbctmc_tpu.recon.joseph import _project_one, make_linear_projector

    rng = np.random.RandomState(0)
    shape = (20, 20, 6)
    spacing = np.array([4.0, 4.0, 4.0])
    origin = -(np.asarray(shape) - 1) * spacing / 2
    pixel_u = (np.arange(GEOM.n_pixels_u) - (GEOM.n_pixels_u - 1) / 2) * 6.0
    pixel_v = (np.arange(GEOM.n_pixels_v) - (GEOM.n_pixels_v - 1) / 2) * 8.0
    e_v = np.array([0.0, 0.0, 1.0])
    n_steps, step_mm = 160, 4.0

    proj = make_linear_projector(
        shape, origin, spacing, pixel_u, pixel_v, e_v,
        n_steps=n_steps, step_mm=step_mm,
    )
    src = jnp.asarray([0.0, -400.0, 0.0], jnp.float32)
    det = jnp.asarray([0.0, 200.0, 0.0], jnp.float32)
    e_u = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    x = jnp.asarray(rng.rand(*shape), jnp.float32)
    y = jnp.asarray(rng.rand(GEOM.n_pixels_v, GEOM.n_pixels_u), jnp.float32)

    ax = proj(x, src, det, e_u)
    aty = jax.vjp(lambda v: proj(v, src, det, e_u), x)[1](y)[0]
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, aty))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1e-6), (lhs, rhs)

    # against plain AD of the same forward (exact transpose by linearity)
    def fwd_ad(v):
        return _project_one(
            v, jnp.asarray(origin, jnp.float32),
            jnp.asarray(spacing, jnp.float32), src, det, e_u,
            jnp.asarray(e_v, jnp.float32),
            jnp.asarray(pixel_u, jnp.float32),
            jnp.asarray(pixel_v, jnp.float32),
            n_steps=n_steps, step_mm=jnp.float32(step_mm),
        )

    np.testing.assert_allclose(np.asarray(fwd_ad(x)), np.asarray(ax),
                               rtol=1e-5, atol=1e-6)
    aty_ad = jax.vjp(fwd_ad, x)[1](y)[0]
    np.testing.assert_allclose(
        np.asarray(aty), np.asarray(aty_ad), rtol=2e-4, atol=2e-5
    )


def test_rooster_checkpoint_resume(tmp_path):
    """1 iteration + resumed 2nd == straight 2-iteration run (bitwise on
    CPU); mismatching runs ignore the checkpoint."""
    spacing = 4.0
    vol = make_cylinder(0.0, spacing=spacing)
    n_proj = 8
    angles = 270.0 + np.arange(n_proj) * 360.0 / n_proj
    projections = np.asarray(
        project_forward(vol, GEOM, angles, volume_spacing=(spacing,) * 3,
                        step_mm=2.0)
    )
    phase = (np.arange(n_proj) % 2) * 0.5
    grid = VolumeGrid(shape=(24, 24, 4), spacing=(8.0, 8.0, 4.0))

    def par(n_iter):
        return RoosterParameters(
            n_phases=2, n_iterations=n_iter, n_data_subiterations=1,
            n_tv_iterations=2,
        )

    ckpt = tmp_path / "rooster.ckpt.npz"
    straight = rooster_reconstruct(
        projections, GEOM, angles, phase, grid=grid, parameters=par(2),
    )

    first = rooster_reconstruct(
        projections, GEOM, angles, phase, grid=grid, parameters=par(1),
        checkpoint_path=str(ckpt),
    )
    assert ckpt.is_file()
    # rewrite the checkpoint under the 2-iteration parameter key so the
    # resumed run accepts it (simulates a crash after outer iteration 1
    # of a 2-iteration run)
    saved = np.load(ckpt)
    import dataclasses as dc
    key = repr((tuple(grid.shape), dc.astuple(par(2)), projections.shape))
    np.savez(ckpt, key=key, outer_done=saved["outer_done"],
             volumes=saved["volumes"])

    resumed = rooster_reconstruct(
        projections, GEOM, angles, phase, grid=grid, parameters=par(2),
        checkpoint_path=str(ckpt),
    )
    np.testing.assert_allclose(resumed, straight, rtol=1e-5, atol=1e-7)
    assert first.shape == straight.shape

    # a checkpoint from a different configuration is ignored
    fresh = rooster_reconstruct(
        projections, GEOM, angles, phase, grid=grid, parameters=par(1),
        checkpoint_path=str(ckpt),
    )
    np.testing.assert_allclose(fresh, first, rtol=1e-5, atol=1e-7)


def test_cg_host_dispatch_matches_fused():
    # the host-dispatched CG (one device program per operator application)
    # must be numerically identical to the fused single-program CG; the
    # split exists because the fused program is the largest XLA computation
    # in the repo and has crashed the TPU worker unattributably
    rng = np.random.default_rng(0)
    geo = ConeBeamGeometry(
        n_pixels_u=48, n_pixels_v=32,
        pixel_size_u=8.0, pixel_size_v=8.0, detector_offset_u=0.0,
    )
    n = 16
    angles = np.linspace(0, 360, n, endpoint=False)
    phase = np.linspace(0, 1, n, endpoint=False)
    proj = rng.random((n, 32, 48), np.float32)
    grid = VolumeGrid(shape=(24, 24, 16), spacing=(8.0, 8.0, 8.0))
    out = {}
    for mode in ("fused", "host"):
        out[mode] = rooster_reconstruct(
            proj, geo, angles, phase, grid=grid,
            parameters=RoosterParameters(
                n_phases=3, n_iterations=2, n_data_subiterations=3,
                cg_dispatch=mode,
            ),
        )
    scale = np.abs(out["fused"]).max()
    assert np.abs(out["fused"] - out["host"]).max() <= 1e-4 * scale


def test_rooster_shearwarp_cg_production_path():
    """The production data term (shear-warp MXU projector pair) separates
    the motion states and reaches an error comparable to the ray-marched
    CG on operator-consistent data."""
    from cbctmc_tpu.recon.shearwarp import shearwarp_project

    spacing = 4.0
    vol_a = make_cylinder(+16.0, spacing=spacing)
    vol_b = make_cylinder(-16.0, spacing=spacing)

    n_proj = 24
    angles = 270.0 + np.arange(n_proj) * 360.0 / n_proj
    proj_a = shearwarp_project(vol_a, GEOM, angles[0::2],
                               volume_spacing=(spacing,) * 3)
    proj_b = shearwarp_project(vol_b, GEOM, angles[1::2],
                               volume_spacing=(spacing,) * 3)
    projections = np.empty((n_proj, GEOM.n_pixels_v, GEOM.n_pixels_u),
                           np.float32)
    projections[0::2] = proj_a
    projections[1::2] = proj_b
    phase = np.where(np.arange(n_proj) % 2 == 0, 0.0, 0.5)
    grid = VolumeGrid(shape=(48, 48, 4), spacing=(spacing,) * 3)

    err_sw, vols = _recon_error(
        projections, angles, phase, grid, spacing, vol_a, vol_b, "cg",
        projector="shearwarp",
    )
    assert np.isfinite(vols).all()
    err_joseph, _ = _recon_error(
        projections, angles, phase, grid, spacing, vol_a, vol_b, "cg",
        projector="joseph",
    )
    # separates the states
    right = vols[:, 28:40, 18:30, 2].mean(axis=(1, 2))
    left = vols[:, 8:20, 18:30, 2].mean(axis=(1, 2))
    assert right[0] > left[0] * 1.2
    assert left[1] > right[1] * 1.2
    # operator-consistent data: shear-warp CG must be at least as good
    assert err_sw < err_joseph * 1.1, (err_sw, err_joseph)
