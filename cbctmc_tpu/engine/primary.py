"""Deterministic primary projection: exact expectation of the MC engine's
primary (unscattered) channel, plus analytic compound-Poisson noise.

The primary channel of the transport engine is, in expectation, a
Beer-Lambert line integral: a history contributes to pixel p iff its
sampled direction points at p (uniform per solid angle inside the fan
aperture, samplers.sample_source_direction) and no interaction occurs along
the ray (probability exp(-integral mu_total dl), which Woodcock
delta-tracking reproduces exactly for the piecewise-constant voxel scene).
Both factors are computable in closed form, so the primary image can be
evaluated deterministically:

    image[p] = f[p] / A_pix * sum_bins w_b <E * T_p(E)>_b   [eV/cm^2/hist]

with f[p] the fraction of emitted photons aimed at pixel p (solid-angle
weights inside the asymmetric fan, `photon_fractions`), w_b the spectrum's
piecewise-uniform bin weights and T_p(E) the transmission along the
pixel-centre ray. The per-pixel photon counts are Poisson, so the noise of
the MC primary at ANY history count can be injected analytically
(`sample_primary`): mean = sum lambda_b E_b, var = sum lambda_b E_b^2 of
the compound-Poisson energy deposit.

This is the fast-scan decomposition used by GPU CBCT simulators in the
literature (gDRR: Jia et al. 2012, arXiv:1204.6367 - deterministic primary
+ low-statistics MC scatter + noise insertion): the expensive MC budget is
only needed for the smooth scatter field, and reference-statistics scans
(1.19e10 histories/view) become tractable on a single chip. The brute-force
engine remains the validation oracle: `deterministic_primary` must match
the MC primary channel within MC error (tests/test_primary.py).

Path lengths use an exact Amanatides-Woo voxel traversal (one gather per
crossed voxel, the engine's packed word) with air-clearance skipping, not
fixed-step sampling: midpoint stepping would leave O(step) per-pixel
fixed-pattern errors at material boundaries, which would corrupt the
injected noise statistics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.engine.ct import DetectorGeom, ScanGeometry
from cbctmc_tpu.engine.transport import (
    _AIR_SHIFT,
    _DEN_MASK,
    _MAT_SHIFT,
    _SOFT_SHIFT,
    VoxelVolume,
)

DEG2RAD = np.pi / 180.0

# id(packed) -> (weakref-less) present-material index array; volumes are
# long-lived within a scan, and a stale hit on a recycled id would only
# change performance... but correctness too (wrong compaction), so the
# cache also keys on shape and a cheap device-side checksum.
_PRESENT_CACHE: dict = {}


def _present_materials_cached(volume) -> np.ndarray:
    import jax.numpy as _jnp

    key = (id(volume.packed), tuple(volume.shape))
    hit = _PRESENT_CACHE.get(key)
    checksum = int(np.asarray(_jnp.bitwise_xor.reduce(volume.packed[:: 4097])))
    if hit is not None and hit[0] == checksum:
        return hit[1]
    present = np.unique(
        (np.asarray(volume.packed) >> _MAT_SHIFT).astype(np.int32)
    )
    _PRESENT_CACHE[key] = (checksum, present)
    return present


def uniform_clearance_volume(
    volume: VoxelVolume, max_level: int = 7
) -> VoxelVolume:
    """PRIMARY-ONLY repack: clearance over UNIFORM regions, not just air.

    The traversal in :func:`_trace_chunk` accumulates ``seg * rho *
    inv_rho_nominal[mat]`` over a whole clearance-box jump, which is exact
    whenever every voxel in the |.|_inf <= 2^k box shares one packed
    (material, density) word — the guarantee the stock volume provides only
    for air. Phantom scenes are piecewise constant (water bulk, solid
    inserts), so generalising the clearance to "word-uniform boxes" lets
    the marcher cross the bulk in multi-voxel spans and cuts the per-view
    gather count (the measured cost floor, docs/ROOFLINE.md round-5
    addendum 2) several-fold. Patient scenes, whose per-voxel densities
    vary continuously, simply keep k = 0 outside air — no loss.

    DO NOT pass the returned volume to the transport engine: its Woodcock
    flight treats clearance boxes as AIR (analytic air crossing,
    transport.py air_skip path), which is wrong for a water box. The
    ``packed_pairs`` view is a dummy so the production engine's paired
    gathers fail loudly on misuse.

    The box-uniformity field is computed with the same block pyramid as
    ``_air_clearance_field``, carrying per-block (min, max) of the base
    word; a level-k block is safe when min == max over its 3^3 block
    neighbourhood (which covers the |.|_inf <= 2^k box of every voxel in
    the centre block). Missing neighbours at the volume edge are ignored
    (identity padding): outside the grid the ray is clipped to t_far, so
    uniformity beyond the edge is irrelevant."""
    nx, ny, nz = (int(s) for s in volume.shape)
    n_vox = nx * ny * nz
    flat = np.asarray(volume.packed)[:n_vox]
    clear_bits = np.uint32((0x7 << _AIR_SHIFT) | (0x7 << _SOFT_SHIFT))
    base = flat & ~clear_bits
    k_air = ((flat >> _AIR_SHIFT) & 0x7).astype(np.uint8)

    w = base.reshape(nz, ny, nx)  # flat = x + y*nx + z*nx*ny
    k_field = np.zeros(w.shape, np.uint8)
    lo, hi = w, w
    for level in range(1, max_level + 1):
        s = lo.shape
        pshape = tuple((d + 1) // 2 * 2 for d in s)
        plo = np.full(pshape, np.uint32(0xFFFFFFFF))
        phi = np.zeros(pshape, np.uint32)
        plo[: s[0], : s[1], : s[2]] = lo
        phi[: s[0], : s[1], : s[2]] = hi
        r = lambda a: a.reshape(
            pshape[0] // 2, 2, pshape[1] // 2, 2, pshape[2] // 2, 2
        )
        lo = r(plo).min(axis=(1, 3, 5))
        hi = r(phi).max(axis=(1, 3, 5))
        nb_lo, nb_hi = lo.copy(), hi.copy()
        for axis in range(3):
            for arr, pad, red in ((nb_lo, np.uint32(0xFFFFFFFF), np.minimum),
                                  (nb_hi, np.uint32(0), np.maximum)):
                shifted_p = np.full_like(arr, pad)
                shifted_m = np.full_like(arr, pad)
                src = [slice(None)] * 3
                dst = [slice(None)] * 3
                src[axis] = slice(0, -1)
                dst[axis] = slice(1, None)
                shifted_p[tuple(dst)] = arr[tuple(src)]
                shifted_m[tuple(src)] = arr[tuple(dst)]
                arr[...] = red(arr, red(shifted_p, shifted_m))
        safe = nb_lo == nb_hi
        if not safe.any():
            break
        fine = np.repeat(
            np.repeat(np.repeat(safe, 1 << level, 0), 1 << level, 1),
            1 << level, 2,
        )[:nz, :ny, :nx]
        k_field[fine] = level

    k_total = np.maximum(k_field.reshape(-1), k_air).astype(np.uint32)
    new_flat = base | (k_total << _AIR_SHIFT)
    if volume.packed.shape[0] != n_vox:  # odd-length pad word
        new_flat = np.concatenate([new_flat, new_flat[-1:]])
    return volume._replace(
        packed=jnp.asarray(new_flat),
        packed_pairs=jnp.zeros((1, 2), jnp.uint32),  # poison: primary-only
    )


# ---------------------------------------------------------------------------
# per-pixel emission fractions
# ---------------------------------------------------------------------------
def photon_fractions(geometry: ScanGeometry) -> np.ndarray:
    """Fraction of emitted histories aimed at each detector pixel,
    [n_pixels_z, n_pixels_x], summing to 1 over the fan aperture.

    Directions are uniform per solid angle within the aperture (uniform in
    (cos theta, phi), rejected to the square field |w/y| <= tan(theta/2) -
    samplers.sample_source_direction), so pixel p at lateral/vertical
    offsets (u, v) from the beam axis on the flat detector receives solid
    angle A * S / r^3 (S = SDD, r = sqrt(u^2 + v^2 + S^2)), clipped to the
    fan bounds u in [-S tan(phi2), S tan(phi1)], |v| <= S tan(theta/2)."""
    s = geometry.sdd
    px, pz = geometry.pixel_size_x, geometry.pixel_size_z
    nx, nz = geometry.n_pixels_x, geometry.n_pixels_z
    u = (np.arange(nx) + 0.5) * px - 0.5 * geometry.detector_size_x
    v = (np.arange(nz) + 0.5) * pz - 0.5 * geometry.detector_size_z

    phi1, phi2, theta = geometry.fan_aperture()
    # sample_source_direction: x = sin(theta)cos(phi), phi in
    # [90-phi1, 90+phi2]; a photon with direction x/y hits the detector at
    # u = S*x/y, so phi=90-phi1 -> u=+S tan(phi1), phi=90+phi2 -> -S tan(phi2)
    u_lo, u_hi = -s * np.tan(phi2 * DEG2RAD), s * np.tan(phi1 * DEG2RAD)
    v_half = s * np.tan(0.5 * theta * DEG2RAD)

    cov_u = np.clip(
        (np.minimum(u + px / 2, u_hi) - np.maximum(u - px / 2, u_lo)) / px,
        0.0, 1.0,
    )
    cov_v = np.clip(
        (np.minimum(v + pz / 2, v_half) - np.maximum(v - pz / 2, -v_half))
        / pz,
        0.0, 1.0,
    )
    r2 = u[None, :] ** 2 + v[:, None] ** 2 + s * s
    w = s / r2 ** 1.5 * (cov_v[:, None] * cov_u[None, :])
    return (w / w.sum()).astype(np.float64)


# ---------------------------------------------------------------------------
# exact per-material path lengths (Amanatides-Woo with air skipping)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("n_materials", "max_iters"))
def _trace_chunk(
    packed: jnp.ndarray,  # u32 [n_vox]
    shape: Tuple[int, int, int],
    voxel_size: jnp.ndarray,  # f32[3] cm
    den_scale: jnp.ndarray,
    inv_rho_nominal: jnp.ndarray,  # f32[n_materials] (0 remaps to slot 0)
    src: jnp.ndarray,  # f32[3]
    dirs: jnp.ndarray,  # f32[n, 3] unit
    n_materials: int,
    max_iters: int,
    mat_remap: jnp.ndarray | None = None,  # i32[n_all] -> compact index
):
    """Relative-density path lengths [n, n_materials] (cm at nominal
    density) along each ray through the voxel volume.

    ``mat_remap`` compacts the material axis to the scene's PRESENT
    materials: the [n, n_materials] accumulator is while_loop-carried
    through HBM every traversal step, so its width is the dominant memory
    traffic — a water scene needs 3 slots, not 22 (the round-4 fast-scan
    ran 22-wide and spent minutes/view on it)."""
    n = dirs.shape[0]
    nx, ny, nz = shape
    dims = jnp.asarray([nx, ny, nz], jnp.float32)
    bbox = voxel_size * dims

    d = dirs
    safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    inv_d = 1.0 / safe_d

    # slab entry/exit of the volume bbox
    t_a = (0.0 - src[None, :]) * inv_d
    t_b = (bbox[None, :] - src[None, :]) * inv_d
    t_near = jnp.max(jnp.minimum(t_a, t_b), axis=1)
    t_far = jnp.min(jnp.maximum(t_a, t_b), axis=1)
    t0 = jnp.maximum(t_near, 0.0) + 1e-4
    hit = t_far > t0

    L = jnp.zeros((n, n_materials), jnp.float32)
    t = jnp.where(hit, t0, t_far)
    active0 = hit

    def cond(carry):
        _, t, active = carry
        return jnp.any(active)

    def body(carry):
        L, t, active = carry
        pos = src[None, :] + d * t[:, None]
        idx3 = jnp.clip(
            jnp.floor(pos / voxel_size[None, :]).astype(jnp.int32),
            0,
            jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)[None, :],
        )
        flat = idx3[:, 0] + idx3[:, 1] * nx + idx3[:, 2] * (nx * ny)
        word = packed[flat]
        mat = (word >> _MAT_SHIFT).astype(jnp.int32)
        if mat_remap is not None:
            mat = mat_remap[mat]
        k_air = ((word >> _AIR_SHIFT) & 0x7).astype(jnp.int32)
        rho = (word & _DEN_MASK).astype(jnp.float32) * den_scale

        # next boundary: air-clearance voxels may jump a (2^k)-voxel-safe
        # box (every voxel within |.|_inf <= 2^k of here is the same air
        # material, so the accumulated material is unchanged by skipping)
        span = (1 << k_air).astype(jnp.float32)[:, None] * voxel_size[None, :]
        base = jnp.floor(pos / span) * span
        step_up = (base + span - pos) * inv_d
        step_dn = (base - pos) * inv_d
        t_step = jnp.where(d > 0, step_up, step_dn)
        dt = jnp.min(t_step, axis=1)
        dt = jnp.maximum(dt, 1e-4)
        t_next = jnp.minimum(t + dt + 1e-4, t_far)
        seg = jnp.maximum(t_next - t, 0.0)

        contrib = seg * rho * inv_rho_nominal[mat]
        onehot = (
            mat[:, None] == jnp.arange(n_materials, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        L = L + jnp.where(active[:, None], contrib[:, None] * onehot, 0.0)
        t = jnp.where(active, t_next, t)
        active = active & (t < t_far - 1e-5)
        return L, t, active

    # while_loop with a hard iteration backstop (sum of dims * 2 covers any
    # ray even without air skipping)
    def bounded_cond(carry_i):
        carry, i = carry_i
        return jnp.logical_and(cond(carry), i < max_iters)

    def bounded_body(carry_i):
        carry, i = carry_i
        return body(carry), i + 1

    (L, _, _), _ = jax.lax.while_loop(
        bounded_cond, bounded_body, ((L, t, active0), jnp.int32(0))
    )
    return L


# ---------------------------------------------------------------------------
# spectrum-resolved transmission and the deterministic image
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SpectrumQuadrature:
    """Energy quadrature matching the engine's piecewise-uniform spectrum
    law (samplers.sample_spectrum_energy_cdf): per bin, `n_sub` equally
    weighted midpoints."""

    energies_ev: np.ndarray  # [n_points]
    weights: np.ndarray  # [n_points], sums to 1
    mu_matrix: np.ndarray  # [n_materials, n_points] mu [1/cm] at nominal rho

    @classmethod
    def build(cls, table_set, spectrum, n_sub: int = 4):
        e = np.asarray(spectrum.energies, np.float64)
        p = np.asarray(spectrum.probabilities, np.float64)[: len(e) - 1]
        p = p / p.sum()
        # n_sub midpoints per [e_k, e_k+1) bin
        offs = (np.arange(n_sub) + 0.5) / n_sub
        pts = (e[:-1, None] + offs[None, :] * np.diff(e)[:, None]).ravel()
        wts = np.repeat(p / n_sub, n_sub)
        idx = np.clip(
            np.rint((pts - table_set.e0) / table_set.de).astype(int),
            0,
            len(table_set.materials[0].mfp_total) - 1,
        )
        mu = np.stack(
            [1.0 / np.asarray(m.mfp_total, np.float64)[idx]
             for m in table_set.materials]
        )
        return cls(
            energies_ev=pts.astype(np.float32),
            weights=wts.astype(np.float32),
            mu_matrix=mu.astype(np.float32),
        )


def _detector_ray_dirs(
    geometry: ScanGeometry, source_pos, det: DetectorGeom, index
) -> np.ndarray:
    """Unit directions source -> pixel centres, [n_z * n_x, 3] (world)."""
    rot_inv = np.asarray(det.rot_inv[index], np.float64)  # world -> +Y frame
    corner = np.asarray(det.corner_min[index], np.float64)  # +Y frame
    px, pz = geometry.pixel_size_x, geometry.pixel_size_z
    u = corner[0] + (np.arange(geometry.n_pixels_x) + 0.5) * px
    wz = corner[2] + (np.arange(geometry.n_pixels_z) + 0.5) * pz
    y = corner[1]
    pix = np.stack(
        [
            np.broadcast_to(u[None, :], (geometry.n_pixels_z, geometry.n_pixels_x)),
            np.full((geometry.n_pixels_z, geometry.n_pixels_x), y),
            np.broadcast_to(wz[:, None], (geometry.n_pixels_z, geometry.n_pixels_x)),
        ],
        axis=-1,
    ).reshape(-1, 3)
    world = pix @ rot_inv  # rot_inv.T @ pix, batched
    d = world - np.asarray(source_pos, np.float64)[None, :]
    return (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)


def deterministic_primary(
    volume: VoxelVolume,
    table_set,
    spectrum,
    geometry: ScanGeometry,
    source,
    detector: DetectorGeom,
    projection_index: int = 0,
    n_sub: int = 2,
    ray_chunk: int = 262_144,
    fractions: np.ndarray | None = None,
    quadrature: SpectrumQuadrature | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Expected primary image and its per-pixel energy-variance image.

    Returns ``(mean, var_per_hist)`` with ``mean`` in eV/cm^2/history (the
    engine's primary-channel units) and ``var_per_hist`` such that the MC
    primary image at ``n`` histories has variance ``var_per_hist / n`` in
    those units (compound Poisson: lambda_b E_b^2 summed over bins)."""
    q = quadrature or SpectrumQuadrature.build(table_set, spectrum, n_sub)
    f = fractions if fractions is not None else photon_fractions(geometry)

    src = np.asarray(source.position[projection_index], np.float32)
    dirs = _detector_ray_dirs(geometry, src, detector, projection_index)
    n_rays = dirs.shape[0]
    n_all = len(table_set.materials)

    inv_rho_all = np.array(
        [1.0 / m.density for m in table_set.materials], np.float32
    )
    nx, ny, nz = volume.shape
    max_iters = 2 * (nx + ny + nz) + 8

    # compact the material axis to the scene's present materials (see
    # _trace_chunk): the accumulator width drives the loop's HBM traffic.
    # Cached per volume — the presence scan readbacks the packed grid once,
    # not once per view.
    present = _present_materials_cached(volume)
    remap = np.zeros(n_all, np.int32)
    remap[present] = np.arange(len(present), dtype=np.int32)
    n_mat = len(present)

    mu = jnp.asarray(q.mu_matrix[present])  # [n_mat, n_pts]
    wE = jnp.asarray(q.weights * q.energies_ev)  # [n_pts]
    wE2 = jnp.asarray(q.weights * q.energies_ev.astype(np.float64) ** 2)

    mean = np.empty(n_rays, np.float32)
    var = np.empty(n_rays, np.float32)
    for s0 in range(0, n_rays, ray_chunk):
        s1 = min(s0 + ray_chunk, n_rays)
        L = _trace_chunk(
            volume.packed, volume.shape, volume.voxel_size,
            volume.den_scale, jnp.asarray(inv_rho_all[present]),
            jnp.asarray(src), jnp.asarray(dirs[s0:s1]),
            n_materials=n_mat, max_iters=max_iters,
            mat_remap=jnp.asarray(remap),
        )
        trans = jnp.exp(-L @ mu)  # [chunk, n_pts]
        mean[s0:s1] = np.asarray(trans @ wE)
        var[s0:s1] = np.asarray(trans @ wE2)

    shape = (geometry.n_pixels_z, geometry.n_pixels_x)
    a_pix = (geometry.pixel_size_x * geometry.pixel_size_z)
    mean_img = f * mean.reshape(shape) / a_pix
    # var of the eV/cm^2/hist image at n histories = var_img / n
    var_img = f * var.reshape(shape) / a_pix**2
    return mean_img.astype(np.float32), var_img.astype(np.float32)


def sample_primary(
    key, mean_img: np.ndarray, var_img: np.ndarray, n_histories: float
) -> np.ndarray:
    """Gaussian sample of the MC primary image at ``n_histories``
    (compound-Poisson moments; accurate above ~10 photons/pixel, which the
    photon-regime audits already require)."""
    std = jnp.sqrt(jnp.asarray(var_img) / float(n_histories))
    noise = jax.random.normal(key, mean_img.shape, jnp.float32) * std
    return np.asarray(jnp.maximum(jnp.asarray(mean_img) + noise, 0.0))
