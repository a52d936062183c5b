"""Deformable image registration: multi-resolution diffusion-regularised
demons in JAX.

Replaces the group-internal ``vroc`` registration library the reference
depends on for correspondence-model building (cbctmc/registration/
correspondence.py:315-345) with a from-scratch, TPU-friendly variational
scheme (Thirion demons forces with Gaussian fluid/diffusion regularisation,
coarse-to-fine pyramid) — the same family of algorithm vroc implements. All
inner math is jittable; the pyramid loop runs on the host.

Displacement fields follow the reference convention: pull-back sampling in
voxel units, ``warped(x) = moving(x + dvf(x))``.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _gaussian_kernel1d(sigma: float) -> np.ndarray:
    radius = max(int(3.0 * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur3d(volume: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur along the three trailing axes."""
    k = kernel.reshape(1, 1, -1)
    pad = kernel.shape[0] // 2
    out = volume
    for axis in range(volume.ndim - 3, volume.ndim):
        moved = jnp.moveaxis(out, axis, -1)
        shape = moved.shape
        flat = moved.reshape(-1, 1, shape[-1])
        flat = jnp.pad(flat, ((0, 0), (0, 0), (pad, pad)), mode="edge")
        conv = jax.lax.conv_general_dilated(
            flat, k, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "IOH", "NCH"),
        )
        out = jnp.moveaxis(conv.reshape(shape), -1, axis)
    return out


def _trilinear_sample(volume: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample volume at voxel coordinates [3, ...], edge-clamped."""
    nx, ny, nz = volume.shape
    x = jnp.clip(coords[0], 0.0, nx - 1.0)
    y = jnp.clip(coords[1], 0.0, ny - 1.0)
    z = jnp.clip(coords[2], 0.0, nz - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nx - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, ny - 2)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, nz - 2)
    fx, fy, fz = x - x0, y - y0, z - z0

    flat = volume.reshape(-1)
    sx, sy = ny * nz, nz
    base = x0 * sx + y0 * sy + z0
    c = lambda off: flat[base + off]
    c00 = c(0) * (1 - fz) + c(1) * fz
    c01 = c(sy) * (1 - fz) + c(sy + 1) * fz
    c10 = c(sx) * (1 - fz) + c(sx + 1) * fz
    c11 = c(sx + sy) * (1 - fz) + c(sx + sy + 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def warp_volume(volume: jnp.ndarray, dvf: jnp.ndarray) -> jnp.ndarray:
    """warped(x) = volume(x + dvf(x)); dvf [3, x, y, z] in voxels."""
    grid = jnp.stack(
        jnp.meshgrid(*(jnp.arange(s, dtype=jnp.float32) for s in volume.shape),
                     indexing="ij")
    )
    return _trilinear_sample(volume, grid + dvf)


@dataclasses.dataclass(frozen=True)
class DemonsParameters:
    iterations: int = 100
    # force step scale (fraction of voxel per update)
    tau: float = 2.0
    # fluid (update) and diffusion (field) smoothing sigmas [voxels]
    sigma_fluid: float = 1.0
    sigma_diffusion: float = 1.25
    n_levels: int = 3
    largest_scale_factor: float = 1.0


@partial(jax.jit, static_argnames=("iterations",))
def _demons_level(fixed, moving, dvf, iterations, tau, k_fluid, k_diff):
    """Demons iterations at one resolution level."""
    gx, gy, gz = jnp.gradient(fixed)
    grad_sq = gx * gx + gy * gy + gz * gz

    def body(_, dvf):
        warped = warp_volume(moving, dvf)
        diff = warped - fixed
        # Thirion demons force (images are pre-normalised to ~[0, 1])
        denom = grad_sq + diff * diff + 1e-9
        scale = -tau * diff / denom
        update = jnp.stack([gx * scale, gy * scale, gz * scale])
        update = _blur3d(update, k_fluid)
        dvf = _blur3d(dvf + update, k_diff)
        return dvf

    return jax.lax.fori_loop(0, iterations, body, dvf)


def _resize3(volume: jnp.ndarray, shape) -> jnp.ndarray:
    return jax.image.resize(volume, shape, method="linear")


def register(
    moving: np.ndarray,
    fixed: np.ndarray,
    parameters: DemonsParameters | None = None,
) -> np.ndarray:
    """Register moving -> fixed; returns the displacement field [3, x, y, z]
    (voxel units) such that ``warp_volume(moving, dvf) ~= fixed``."""
    p = parameters or DemonsParameters()
    fixed = jnp.asarray(fixed, jnp.float32)
    moving = jnp.asarray(moving, jnp.float32)

    # intensity normalisation for a stable force magnitude
    lo, hi = jnp.percentile(fixed, jnp.array([1.0, 99.0]))
    scale = 1.0 / jnp.maximum(hi - lo, 1e-6)
    fixed_n = (fixed - lo) * scale
    moving_n = (moving - lo) * scale

    k_fluid = jnp.asarray(_gaussian_kernel1d(p.sigma_fluid))
    k_diff = jnp.asarray(_gaussian_kernel1d(p.sigma_diffusion))

    shapes = []
    for level in range(p.n_levels - 1, -1, -1):
        factor = p.largest_scale_factor / (2**level)
        shapes.append(
            tuple(max(8, int(round(s * factor))) for s in fixed.shape)
        )

    dvf = jnp.zeros((3, *shapes[0]), jnp.float32)
    for i, shape in enumerate(shapes):
        if i > 0:
            ratio = jnp.asarray(
                [shape[d] / dvf.shape[1 + d] for d in range(3)], jnp.float32
            )
            dvf = _resize3(dvf, (3, *shape)) * ratio[:, None, None, None]
        f_level = _resize3(fixed_n, shape)
        m_level = _resize3(moving_n, shape)
        dvf = _demons_level(
            f_level, m_level, dvf, p.iterations, jnp.float32(p.tau),
            k_fluid, k_diff,
        )
        logger.debug("demons level %d done: shape=%s", i, shape)

    if dvf.shape[1:] != fixed.shape:
        ratio = jnp.asarray(
            [fixed.shape[d] / dvf.shape[1 + d] for d in range(3)], jnp.float32
        )
        dvf = _resize3(dvf, (3, *fixed.shape)) * ratio[:, None, None, None]
    return np.asarray(dvf)


def register_phases(
    images: np.ndarray | Sequence[np.ndarray],
    reference_index: int = 2,
    parameters: DemonsParameters | None = None,
) -> np.ndarray:
    """Register every phase to the reference phase (moving=reference,
    fixed=phase, so that warping the reference geometry with the predicted
    field produces the phase — the correspondence-model convention).
    Returns [n_phases, 3, x, y, z]."""
    images = np.asarray(images)
    reference = images[reference_index]
    fields = []
    for i, phase in enumerate(images):
        if i == reference_index:
            fields.append(np.zeros((3, *reference.shape), np.float32))
            continue
        logger.info("Registering phase %d to reference %d", i, reference_index)
        fields.append(register(moving=reference, fixed=phase, parameters=parameters))
    return np.stack(fields)
