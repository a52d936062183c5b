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

    # march from the source to the detector with fixed step
    def step_fn(i, acc):
        t = (i + 0.5) * step_mm
        p = source[None, None, :] + ray_dir * t
        x = (p[..., 0] - vol_origin[0]) / vol_spacing[0]
        y = (p[..., 1] - vol_origin[1]) / vol_spacing[1]
        z = (p[..., 2] - vol_origin[2]) / vol_spacing[2]
        return acc + _trilinear(volume, x, y, z)

    acc = jax.lax.fori_loop(
        0, n_steps, step_fn, jnp.zeros(uu.shape, jnp.float32)
    )
    return acc * step_mm


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
    max_path = float(geometry.sdd + np.linalg.norm(np.asarray(volume.shape) * spacing))
    n_steps = int(np.ceil(max_path / step_mm))

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
