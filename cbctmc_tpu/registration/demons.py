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
    # reject updates where the transform's Jacobian determinant would fall
    # below this bound (folding prevention; 0 disables the check)
    jacobian_min: float = 0.05


def jacobian_determinant(dvf: jnp.ndarray) -> jnp.ndarray:
    """det(J) of the transform x + dvf(x) via central differences; values
    below 0 mark folding (the regularisation target the reference gets from
    vroc's constrained registration)."""
    eye = jnp.eye(3, dtype=dvf.dtype)
    rows = []
    for c in range(3):
        g = jnp.stack(jnp.gradient(dvf[c]))  # d dvf_c / d axis
        rows.append(g + eye[c][:, None, None, None])
    j = jnp.stack(rows)  # [c, axis, x, y, z]
    det = (
        j[0, 0] * (j[1, 1] * j[2, 2] - j[1, 2] * j[2, 1])
        - j[0, 1] * (j[1, 0] * j[2, 2] - j[1, 2] * j[2, 0])
        + j[0, 2] * (j[1, 0] * j[2, 1] - j[1, 1] * j[2, 0])
    )
    return det


@partial(jax.jit, static_argnames=("iterations", "use_jacobian"))
def _demons_level(fixed, moving, dvf, iterations, tau, k_fluid, k_diff,
                  mask, jac_min, use_jacobian):
    """Demons iterations at one resolution level. Forces are restricted to
    ``mask`` (ones when unmasked) and updates that would fold the transform
    (det J < jac_min) are rejected voxel-wise."""
    gx, gy, gz = jnp.gradient(fixed)
    grad_sq = gx * gx + gy * gy + gz * gz

    def body(_, dvf):
        warped = warp_volume(moving, dvf)
        diff = (warped - fixed) * mask
        # Thirion demons force (images are pre-normalised to ~[0, 1])
        denom = grad_sq + diff * diff + 1e-9
        scale = -tau * diff / denom
        update = jnp.stack([gx * scale, gy * scale, gz * scale])
        update = _blur3d(update, k_fluid)
        new_dvf = _blur3d(dvf + update, k_diff)
        if use_jacobian:
            folded = jacobian_determinant(new_dvf) < jac_min
            new_dvf = jnp.where(folded[None], dvf, new_dvf)
        return new_dvf

    return jax.lax.fori_loop(0, iterations, body, dvf)


def _resize3(volume: jnp.ndarray, shape) -> jnp.ndarray:
    return jax.image.resize(volume, shape, method="linear")


def register(
    moving: np.ndarray,
    fixed: np.ndarray,
    parameters: DemonsParameters | None = None,
    moving_mask: np.ndarray | None = None,
    fixed_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Register moving -> fixed; returns the displacement field [3, x, y, z]
    (voxel units) such that ``warp_volume(moving, dvf) ~= fixed``.

    When masks are given the demons forces act only inside their (slightly
    blurred) union, like the reference's masked vroc registration for
    correspondence-model building (cbctmc/registration/
    correspondence.py:325-330)."""
    p = parameters or DemonsParameters()
    fixed = jnp.asarray(fixed, jnp.float32)
    moving = jnp.asarray(moving, jnp.float32)

    mask_full = None
    if moving_mask is not None or fixed_mask is not None:
        m = np.zeros(fixed.shape, np.float32)
        if moving_mask is not None:
            m = np.maximum(m, np.asarray(moving_mask, np.float32))
        if fixed_mask is not None:
            m = np.maximum(m, np.asarray(fixed_mask, np.float32))
        mask_full = jnp.asarray(m)

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
        if mask_full is not None:
            mask_level = _blur3d(
                _resize3(mask_full, shape), k_fluid
            )
            mask_level = jnp.clip(mask_level, 0.0, 1.0)
        else:
            mask_level = jnp.ones(shape, jnp.float32)
        dvf = _demons_level(
            f_level, m_level, dvf, p.iterations, jnp.float32(p.tau),
            k_fluid, k_diff, mask_level, jnp.float32(p.jacobian_min),
            p.jacobian_min > 0,
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
    masks: np.ndarray | Sequence[np.ndarray] | None = None,
    masked_registration: bool = True,
) -> np.ndarray:
    """Register every phase to the reference phase (moving=reference,
    fixed=phase, so that warping the reference geometry with the predicted
    field produces the phase — the correspondence-model convention).
    ``masks`` (per phase, e.g. lung masks) restrict the demons forces as in
    the reference's masked registration. Returns [n_phases, 3, x, y, z]."""
    images = np.asarray(images)
    reference = images[reference_index]
    use_masks = masked_registration and masks is not None
    fields = []
    for i, phase in enumerate(images):
        if i == reference_index:
            fields.append(np.zeros((3, *reference.shape), np.float32))
            continue
        logger.info("Registering phase %d to reference %d", i, reference_index)
        fields.append(register(
            moving=reference, fixed=phase, parameters=parameters,
            moving_mask=masks[reference_index] if use_masks else None,
            fixed_mask=masks[i] if use_masks else None,
        ))
    return np.stack(fields)
