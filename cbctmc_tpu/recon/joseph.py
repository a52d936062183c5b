"""Forward projection: ray-driven line integrals through a voxel volume.

Replaces the reference's RTK ``JosephForwardProjectionImageFilter`` CPU/CUDA
path (cbctmc/forward_projection.py:94-149). TPU-first formulation: instead
of Joseph's per-ray major-axis switching (data-dependent control flow), all
rays march with a fixed physical step and trilinear interpolation inside a
``lax.fori_loop`` — fully vectorised over the detector, gathers batched per
step. At step <= half the voxel size this agrees with the Joseph integral to
well below the MC noise floor.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.recon.geometry import ConeBeamGeometry


def _ray_box_entry(origin3, extent3, source, ray_dir):
    """Per-ray entry distance into the trilinear support box
    [origin, origin + extent] (mm). Rays that miss get t_near > t_far;
    marching from their t_near samples outside the box, where
    _trilinear returns 0 — correct by construction."""
    lo = origin3[None, :]
    hi = (origin3 + extent3)[None, :]
    src = source[None, :]
    t1 = (lo - src) / ray_dir
    t2 = (hi - src) / ray_dir
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    return jnp.maximum(t_near, 0.0)


def _trilinear(volume: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray):
    """Trilinear interpolation at voxel-index coordinates; zero outside."""
    nx, ny, nz = volume.shape
    inside = (
        (x >= 0.0) & (x <= nx - 1.0)
        & (y >= 0.0) & (y <= ny - 1.0)
        & (z >= 0.0) & (z <= nz - 1.0)
    )
    x = jnp.clip(x, 0.0, nx - 1.0)
    y = jnp.clip(y, 0.0, ny - 1.0)
    z = jnp.clip(z, 0.0, nz - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nx - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, ny - 2)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, nz - 2)
    fx = x - x0
    fy = y - y0
    fz = z - z0

    flat = volume.reshape(-1)
    sy = nz
    sx = ny * nz
    base = x0 * sx + y0 * sy + z0

    c000 = flat[base]
    c001 = flat[base + 1]
    c010 = flat[base + sy]
    c011 = flat[base + sy + 1]
    c100 = flat[base + sx]
    c101 = flat[base + sx + 1]
    c110 = flat[base + sx + sy]
    c111 = flat[base + sx + sy + 1]

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return jnp.where(inside, c0 * (1 - fx) + c1 * fx, 0.0)


@partial(jax.jit, static_argnames=("n_steps",))
def _project_one(
    volume, vol_origin, vol_spacing,
    source, det_origin_point, e_u, e_v, pixel_u, pixel_v,
    n_steps: int, step_mm,
):
    """Line integrals for one projection; pixel_u/v are 1-D coordinate
    arrays [nu], [nv] in mm on the detector axes."""
    uu, vv = jnp.meshgrid(pixel_u, pixel_v)  # [nv, nu]
    det_points = (
        det_origin_point[None, None, :]
        + uu[..., None] * e_u[None, None, :]
        + vv[..., None] * e_v[None, None, :]
    )
    ray = det_points - source[None, None, :]
    ray_len = jnp.linalg.norm(ray, axis=-1)
    ray_dir = ray / ray_len[..., None]

    # march only the ray's intersection with the volume support: the
    # per-ray AABB entry distance replaces ~3/4 of the steps a march from
    # the source would waste outside the volume (n_steps is sized from the
    # volume diagonal by the callers)
    nx, ny, nz = volume.shape
    extent = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.float32) * vol_spacing
    t_near = _ray_box_entry(vol_origin, extent, source,
                            ray_dir.reshape(-1, 3)).reshape(ray_len.shape)

    def step_fn(i, acc):
        t = t_near + (i + 0.5) * step_mm
        p = source[None, None, :] + ray_dir * t[..., None]
        x = (p[..., 0] - vol_origin[0]) / vol_spacing[0]
        y = (p[..., 1] - vol_origin[1]) / vol_spacing[1]
        z = (p[..., 2] - vol_origin[2]) / vol_spacing[2]
        return acc + _trilinear(volume, x, y, z)

    acc = jax.lax.fori_loop(
        0, n_steps, step_fn, jnp.zeros(uu.shape, jnp.float32)
    )
    return acc * step_mm


# offsets of the 8 trilinear corners in the flat volume, as multiples of
# (sx, sy, 1); paired with the weight products in _splat_one below. The
# ordering mirrors _trilinear's c000..c111.
def _corner_offsets(sx, sy):
    return jnp.asarray(
        [0, 1, sy, sy + 1, sx, sx + 1, sx + sy, sx + sy + 1], jnp.int32
    )


@partial(jax.jit, static_argnames=("n_steps", "vol_shape"))
def _splat_one(
    g, vol_shape, vol_origin, vol_spacing,
    source, det_origin_point, e_u, e_v, pixel_u, pixel_v,
    n_steps: int, step_mm,
):
    """Exact transpose of :func:`_project_one` with respect to the volume:
    scatter-adds ``g * step_mm`` through the SAME ray march and trilinear
    weights (a "splat" backprojection). Replaces reverse-mode AD of the
    step loop, whose scan-VJP stores O(rays * n_steps) residuals — tens of
    GB at 4D-recon scale (it OOM-killed the CPU run and kernel-faulted the
    TPU worker). This adjoint needs O(rays + volume) memory."""
    nx, ny, nz = vol_shape
    uu, vv = jnp.meshgrid(pixel_u, pixel_v)  # [nv, nu]
    det_points = (
        det_origin_point[None, None, :]
        + uu[..., None] * e_u[None, None, :]
        + vv[..., None] * e_v[None, None, :]
    )
    ray = det_points - source[None, None, :]
    ray_dir = ray / jnp.linalg.norm(ray, axis=-1)[..., None]
    ray_dir = ray_dir.reshape(-1, 3)
    gflat = (g * step_mm).reshape(-1)

    extent = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.float32) * vol_spacing
    t_near = _ray_box_entry(vol_origin, extent, source, ray_dir)

    sy = nz
    sx = ny * nz
    offs = _corner_offsets(sx, sy)  # [8]

    def step_fn(i, volbar):
        t = t_near + (i + 0.5) * step_mm
        p = source[None, :] + ray_dir * t[:, None]
        x = (p[:, 0] - vol_origin[0]) / vol_spacing[0]
        y = (p[:, 1] - vol_origin[1]) / vol_spacing[1]
        z = (p[:, 2] - vol_origin[2]) / vol_spacing[2]
        inside = (
            (x >= 0.0) & (x <= nx - 1.0)
            & (y >= 0.0) & (y <= ny - 1.0)
            & (z >= 0.0) & (z <= nz - 1.0)
        )
        x = jnp.clip(x, 0.0, nx - 1.0)
        y = jnp.clip(y, 0.0, ny - 1.0)
        z = jnp.clip(z, 0.0, nz - 1.0)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nx - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, ny - 2)
        z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, nz - 2)
        fx, fy, fz = x - x0, y - y0, z - z0
        base = x0 * sx + y0 * sy + z0
        gx0, gx1 = 1.0 - fx, fx
        gy0, gy1 = 1.0 - fy, fy
        gz0, gz1 = 1.0 - fz, fz
        w = jnp.stack([
            gx0 * gy0 * gz0, gx0 * gy0 * gz1,
            gx0 * gy1 * gz0, gx0 * gy1 * gz1,
            gx1 * gy0 * gz0, gx1 * gy0 * gz1,
            gx1 * gy1 * gz0, gx1 * gy1 * gz1,
        ])  # [8, n]
        vals = jnp.where(inside[None, :], w * gflat[None, :], 0.0)
        idx = base[None, :] + offs[:, None]  # [8, n]
        return volbar.at[idx.reshape(-1)].add(vals.reshape(-1))

    volbar = jax.lax.fori_loop(
        0, n_steps, step_fn, jnp.zeros(nx * ny * nz, jnp.float32)
    )
    return volbar.reshape(vol_shape)


def make_linear_projector(
    vol_shape, vol_origin, vol_spacing, pixel_u, pixel_v, e_v,
    n_steps: int, step_mm,
):
    """A per-projection forward operator ``proj(volume, source,
    det_origin_point, e_u) -> [nv, nu]`` whose reverse-mode derivative is
    the analytic splat adjoint (:func:`_splat_one`) instead of AD through
    the step loop. The map is linear in the volume, so the VJP is its
    exact transpose; iterative solvers (ROOSTER CG) get matched A/A^T with
    O(rays + volume) memory. vmap-compatible over (source, det, e_u)."""
    vol_origin = jnp.asarray(vol_origin, jnp.float32)
    vol_spacing = jnp.asarray(vol_spacing, jnp.float32)
    pixel_u = jnp.asarray(pixel_u, jnp.float32)
    pixel_v = jnp.asarray(pixel_v, jnp.float32)
    e_v = jnp.asarray(e_v, jnp.float32)
    step_mm = jnp.float32(step_mm)

    @jax.custom_vjp
    def proj(volume, source, det_origin_point, e_u):
        return _project_one(
            volume, vol_origin, vol_spacing, source, det_origin_point,
            e_u, e_v, pixel_u, pixel_v, n_steps=n_steps, step_mm=step_mm,
        )

    def fwd(volume, source, det_origin_point, e_u):
        return proj(volume, source, det_origin_point, e_u), (
            source, det_origin_point, e_u,
        )

    def bwd(res, gbar):
        source, det_origin_point, e_u = res
        volbar = _splat_one(
            gbar, tuple(vol_shape), vol_origin, vol_spacing, source,
            det_origin_point, e_u, e_v, pixel_u, pixel_v,
            n_steps=n_steps, step_mm=step_mm,
        )
        return (
            volbar,
            jnp.zeros_like(source),
            jnp.zeros_like(det_origin_point),
            jnp.zeros_like(e_u),
        )

    proj.defvjp(fwd, bwd)
    return proj


def project_forward(
    volume: np.ndarray,
    geometry: ConeBeamGeometry,
    angles_deg: Sequence[float],
    volume_spacing=(1.0, 1.0, 1.0),
    volume_origin=None,
    step_mm: float | None = None,
) -> np.ndarray:
    """Cone-beam forward projection.

    Args:
        volume: [x, y, z] values (e.g. mu in 1/mm) centred on the isocenter
            unless ``volume_origin`` (mm, centre of voxel 0) is given.
    Returns:
        [n_projections, nv, nu] line integrals (value-unit * mm).
    """
    volume = jnp.asarray(volume, jnp.float32)
    spacing = np.asarray(volume_spacing, np.float64)
    if volume_origin is None:
        volume_origin = -(np.asarray(volume.shape) - 1) * spacing / 2
    volume_origin = np.asarray(volume_origin, np.float64)

    if step_mm is None:
        step_mm = 0.5 * float(spacing.min())
    # rays are marched from their per-ray volume entry (_ray_box_entry), so
    # the step budget is the longest chord through the support box — the
    # diagonal — not source-to-detector
    max_path = float(np.linalg.norm((np.asarray(volume.shape) - 1) * spacing))
    n_steps = int(np.ceil(max_path / step_mm)) + 1

    sources = geometry.source_positions(angles_deg)
    dirs = geometry.beam_directions(angles_deg)
    e_us = geometry.u_axes(angles_deg)
    e_v = np.array([0.0, 0.0, 1.0])
    pixel_u = jnp.asarray(geometry.u_coordinates(), jnp.float32)
    pixel_v = jnp.asarray(geometry.v_coordinates(), jnp.float32)

    out = np.empty(
        (len(angles_deg), geometry.n_pixels_v, geometry.n_pixels_u), np.float32
    )
    # the detector is marched in row tiles of <= ~200k pixels: a single
    # program over the full 1024x768 grid reproducibly crashes the TPU
    # runtime (kernel fault in the [nv, nu]-shaped gather chain at ~786k
    # rays x ~2000 steps), and tiling also bounds the gather scratch
    n_v = geometry.n_pixels_v
    max_rows = max(1, min(n_v, 200_000 // max(geometry.n_pixels_u, 1)))
    n_tiles = -(-n_v // max_rows)
    rows_per_tile = -(-n_v // n_tiles)  # equalised -> fewer compile shapes
    for i in range(len(angles_deg)):
        det_center = sources[i] + dirs[i] * geometry.sdd
        for v0 in range(0, n_v, rows_per_tile):
            v1 = min(v0 + rows_per_tile, n_v)
            out[i, v0:v1] = np.asarray(
                _project_one(
                    volume,
                    jnp.asarray(volume_origin, jnp.float32),
                    jnp.asarray(spacing, jnp.float32),
                    jnp.asarray(sources[i], jnp.float32),
                    jnp.asarray(det_center, jnp.float32),
                    jnp.asarray(e_us[i], jnp.float32),
                    jnp.asarray(e_v, jnp.float32),
                    pixel_u,
                    pixel_v[v0:v1],
                    n_steps=n_steps,
                    step_mm=jnp.float32(step_mm),
                )
            )
    return out
