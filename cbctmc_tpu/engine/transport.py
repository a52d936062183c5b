"""The photon-transport engine: batched Woodcock delta-tracking.

TPU-first re-design of the reference's per-thread history loop
(docker/mcgpu/MC-GPU_kernel_v1.3.cu:120-384). Instead of one CUDA thread
per history, a fixed batch of photon *lanes* is stepped in lockstep inside a
``lax.while_loop``; dead lanes (escaped / absorbed) are immediately refilled
with fresh source photons until the history budget is exhausted, so vector
utilisation stays near 100% regardless of path-length stragglers.

Performance model (engine v2): on TPU, every gather/scatter op costs a few
nanoseconds *per lane index* regardless of the table size or row width,
while element-wise/VPU work and small one-hot selects are effectively free.
The engine is therefore organised to minimise the NUMBER of gather ops per
retired history:

- the voxel grid is packed into ONE u32 per voxel
  (material | air-clearance-level | 24-bit fixed-point density), so each
  Woodcock flight performs one voxel gather plus one 2-wide gather of the
  total inverse-MFP (a, b) pair at a fused (energy-bin, material) index
  (engine v3.1: the previous design gathered [n_mats]-wide rows per
  iteration and one-hot-selected the material per flight, but XLA
  rematerialises the select chain into every unrolled flight, re-reading
  ~180 MB of row data per trip at 1M lanes - the fused-index gather against
  a ~4 MB table prices a few ns per lane instead),
- the per-bin Woodcock majorant and air MFPs are gathered per lane once per
  outer iteration (energy is constant between real events) and refreshed
  at adoption / mid-iteration Compton resolves,
- event tables (Compton/Rayleigh inverse-MFP pairs, S(E,pi), Rayleigh pmax)
  are fetched with ONE 6-wide fused-index gather per compacted event batch,
- Compton shell tables are fetched with a single one-hot matmul on the MXU,
- Rayleigh RITA tables are fetched as whole per-material rows once per event
  batch; the interval search becomes a vectorised compare-count and the
  interval values one-hot selects (no per-trip gathers),
- air is crossed analytically: outside the tight bounding box of all
  non-air voxels one exponential flight against the air majorant reaches
  the box (or the detector) directly, and inside the volume a conservative
  "clearance pyramid" (each voxel stores the largest k such that the
  surrounding (2^k)-voxel box is pure air) lets flights through air pockets
  use the air majorant with steps clamped to the clearance radius. Clamped
  steps are null events - standard delta-tracking with a piecewise
  majorant, unbiased by the memoryless property.

Lane scheduling: a lane whose photon escapes mid-iteration stashes the
detector record and immediately adopts a pre-sampled candidate photon (its
energy-row data is prefetched from a second, independent pool - sharing the
refill pool starves adoption), so flight slots stay busy instead of idling
until the next refill.

Each outer iteration:

1. refills dead lanes from the fan-beam source (energy via Walker alias,
   square-field direction rejection, translation to the bbox wall) and
   pre-samples the adoption candidates,
2. gathers the per-lane majorant (Woodcock + air) MFPs for the lane and
   candidate photons,
3. runs a bounded inner loop of Woodcock virtual events - a single packed
   voxel gather per flight - with escape-stash-adopt handling inline (the
   analogue of the reference's v1.3 "virtual interaction loop"),
4. tallies the stashed records and parked second-escape lanes into the 4
   scatter-separated detector images with masked scatter-adds (replacing
   atomicAdd),
5. resolves real events on a stream-compacted batch: Compton (PENELOPE
   GCOa) / Rayleigh (RITA) / photoelectric, by cumulative probability of
   the interpolated partial inverse MFPs.

Detector images accumulate energy in eV (float32); the caller normalises to
eV/cm^2/history (reference: report_image, MC-GPU_v1.3.cu:2860-2861).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.engine import samplers
from cbctmc_tpu.engine.rng import uniform_open
from cbctmc_tpu.engine.samplers import FanBeamSource
from cbctmc_tpu.engine.ct import DetectorGeom
from cbctmc_tpu.engine.tables import DeviceTables, WoodcockTable
from cbctmc_tpu.physics.constants import EPS_SOURCE, TALLY_MIN_COS_ANGLE, TWO_PI

NEG_INF = jnp.float32(-1.0e9)
BIG = jnp.float32(1.0e30)

# scatter states (match the reference image ordering)
PRIMARY, COMPTON, RAYLEIGH, MULTI = 0, 1, 2, 3

# packed voxel word layout
_MAT_SHIFT = 27  # 5 bits material
_AIR_SHIFT = 24  # 3 bits air-clearance level k (safe box half-size 2^k)
_SOFT_SHIFT = 21  # 3 bits soft-clearance level (heavy-free box half-size)
_DEN_MASK = (1 << 21) - 1  # 21-bit fixed-point density
_MAX_AIR_LEVEL = 7


class VoxelVolume(NamedTuple):
    """Voxelised scene in engine units: bbox corner at the origin, voxel
    (i,j,k) spans [i*dx,(i+1)*dx) x ... Flat index = x + y*nx + z*nx*ny
    (reference: locate_voxel, kernel :1033-1065).

    The per-voxel word packs (material index | air-clearance level |
    density) so the hot Woodcock loop performs one gather per flight."""

    packed: jnp.ndarray  # u32 [nx*ny*nz (+1 pad if odd)]
    # the SAME words viewed as consecutive pairs, u32 [ceil(n_vox/2), 2].
    # Kept as a separate INPUT array: row gathers against a [N/2, 2] input
    # use its dense parameter layout (~8.6 ns/idx at 500 MB), whereas a
    # reshape inside the jitted program is materialised with the TPU's
    # (8, 128) tiled layout - the 2-wide minor dimension pads to 128 lanes
    # and a 500 MB volume explodes to 32 GB (measured: OOM at trace time).
    # XLA prunes whichever view a given engine config leaves unused.
    packed_pairs: jnp.ndarray
    shape: Tuple[int, int, int]  # (nx, ny, nz) static
    voxel_size: jnp.ndarray  # f32[3] [cm]
    bbox: jnp.ndarray  # f32[3] [cm]
    den_scale: jnp.ndarray  # f32 scalar: density = q * den_scale
    air_den_max: jnp.ndarray  # f32 scalar: max quantised air density
    voxmin: jnp.ndarray  # f32 scalar: min voxel dimension [cm]
    # tight axis-aligned bounding box of all non-air voxels [cm]: outside
    # this box the scene is pure air, so flights sample one exponential
    # against the analytic air majorant instead of hopping the clearance
    # pyramid (entry, exit and miss paths cost ~1 flight each)
    nonair_lo: jnp.ndarray  # f32[3]
    nonair_hi: jnp.ndarray  # f32[3]

    @property
    def material(self) -> jnp.ndarray:  # i32 [n_voxels], 0-based
        return (self.packed >> _MAT_SHIFT).astype(jnp.int32)

    @property
    def density(self) -> jnp.ndarray:  # f32 [n_voxels] [g/cm^3]
        return (self.packed & _DEN_MASK).astype(jnp.float32) * self.den_scale


def _air_clearance_field(nonair: np.ndarray, max_level: int) -> np.ndarray:
    """Per-voxel air-clearance level: the largest k <= max_level such that
    every voxel u with |u - v|_inf <= 2^k is air (0 if the 3^3 neighbourhood
    already contains non-air).

    Computed with a block max-pyramid: at level k the volume is reduced to
    2^k-voxel blocks; a voxel is safe at level k when its block and all 26
    neighbouring blocks are air-only (the 3x3x3 block region spans at least
    2^k voxels beyond the centre block in every direction, so it covers the
    |.|_inf <= 2^k box around ANY voxel of the centre block)."""
    k_field = np.zeros(nonair.shape, np.uint8)
    blocked = nonair.astype(np.uint8)
    for level in range(1, max_level + 1):
        # 2x block-reduce (pad to even with air=0)
        s = blocked.shape
        padded = np.zeros(
            ((s[0] + 1) // 2 * 2, (s[1] + 1) // 2 * 2, (s[2] + 1) // 2 * 2),
            np.uint8,
        )
        padded[: s[0], : s[1], : s[2]] = blocked
        p = padded.reshape(
            padded.shape[0] // 2, 2, padded.shape[1] // 2, 2, padded.shape[2] // 2, 2
        )
        blocked = p.max(axis=(1, 3, 5))
        # 3^3 neighbour max (edges padded with air: outside the volume the
        # photon escapes anyway)
        nb = blocked.copy()
        for axis in range(3):
            shifted_p = np.zeros_like(nb)
            shifted_m = np.zeros_like(nb)
            src = [slice(None)] * 3
            dst = [slice(None)] * 3
            src[axis] = slice(0, -1)
            dst[axis] = slice(1, None)
            shifted_p[tuple(dst)] = nb[tuple(src)]
            shifted_m[tuple(src)] = nb[tuple(dst)]
            nb = np.maximum(nb, np.maximum(shifted_p, shifted_m))
        safe = nb == 0
        if not safe.any():
            break
        # broadcast the level-k safety back to the fine grid
        fine = np.repeat(
            np.repeat(np.repeat(safe, 1 << level, 0), 1 << level, 1), 1 << level, 2
        )[: nonair.shape[0], : nonair.shape[1], : nonair.shape[2]]
        k_field[fine] = level
    return k_field


def make_voxel_volume(
    materials_0based: np.ndarray,
    densities: np.ndarray,
    voxel_size_cm,
    air_material: int = 0,
    max_air_level: int = _MAX_AIR_LEVEL,
    heavy_mask: np.ndarray | None = None,
) -> VoxelVolume:
    """Pack the scene into per-voxel u32 words.

    ``heavy_mask`` (from :func:`tables.split_heavy_voxels`) marks voxels
    excluded from the soft Woodcock majorant; the packed word then carries
    a second clearance level (largest k with a heavy-free (2^k)-box) that
    lets flights in the water-dominated bulk sample against the looser
    soft majorant. Omit it to disable the soft tier (level 0 everywhere).
    """
    nx, ny, nz = materials_0based.shape
    voxel_size = np.asarray(voxel_size_cm, dtype=np.float32)
    bbox = voxel_size * np.array([nx, ny, nz], np.float32)

    den = np.asarray(densities, np.float32)
    den_max = float(max(den.max(), 1e-6))
    den_scale = den_max / float(_DEN_MASK)
    q = np.clip(np.rint(den / den_scale), 0, _DEN_MASK).astype(np.uint32)

    mats = materials_0based.astype(np.uint32)
    is_air = materials_0based == air_material
    if is_air.any():
        air_den_max = float(q[is_air].max()) * den_scale
        k_field = _air_clearance_field(~is_air, max_air_level)
    else:
        air_den_max = den_scale  # never used: clearance field stays 0
        k_field = np.zeros(materials_0based.shape, np.uint8)
    if heavy_mask is not None and heavy_mask.any():
        k_soft_field = _air_clearance_field(
            np.asarray(heavy_mask, bool), max_air_level
        )
    else:
        k_soft_field = np.zeros(materials_0based.shape, np.uint8)

    # tight non-air bounding box in cm (empty box when the scene is all air)
    nonair = ~is_air
    if nonair.any():
        lo, hi = [], []
        for axis in range(3):
            proj = nonair.any(axis=tuple(a for a in range(3) if a != axis))
            idx = np.nonzero(proj)[0]
            lo.append(idx[0] * voxel_size[axis])
            hi.append((idx[-1] + 1) * voxel_size[axis])
        nonair_lo = np.array(lo, np.float32)
        nonair_hi = np.array(hi, np.float32)
    else:
        nonair_lo = bbox.astype(np.float32) + 1.0
        nonair_hi = bbox.astype(np.float32) + 1.0  # lo >= hi: every ray misses

    packed = (
        (mats << _MAT_SHIFT)
        | (k_field.astype(np.uint32) << _AIR_SHIFT)
        | (k_soft_field.astype(np.uint32) << _SOFT_SHIFT)
        | q
    )
    # flatten with x fastest: flat = x + y*nx + z*nx*ny; pad to an even
    # length so the paired-row gather layout (engine v4) can view the
    # buffer as [n_vox/2, 2] (the pad word is never addressed: indices are
    # clipped to nx*ny*nz - 1)
    flat = np.transpose(packed, (2, 1, 0)).reshape(-1)
    if flat.shape[0] % 2:
        flat = np.concatenate([flat, flat[-1:]])
    return VoxelVolume(
        packed=jnp.asarray(flat),
        packed_pairs=jnp.asarray(flat.reshape(-1, 2)),
        shape=(nx, ny, nz),
        voxel_size=jnp.asarray(voxel_size),
        bbox=jnp.asarray(bbox),
        den_scale=jnp.float32(den_scale),
        air_den_max=jnp.float32(max(air_den_max, 1e-12)),
        voxmin=jnp.float32(float(voxel_size.min())),
        nonair_lo=jnp.asarray(nonair_lo),
        nonair_hi=jnp.asarray(nonair_hi),
    )


def make_scene(
    table_set,
    materials_0based: np.ndarray,
    densities: np.ndarray,
    voxel_size_cm,
    air_material: int = 0,
    soft_quantile: float = 0.90,
):
    """One-call scene preparation: packed voxel volume + two-tier Woodcock
    majorant tables (full + soft, see tables.split_heavy_voxels). Returns
    ``(volume, woodcock)`` ready for :func:`run_projection`."""
    from cbctmc_tpu.engine.tables import build_woodcock_table, split_heavy_voxels

    den = np.asarray(densities, np.float32)
    max_density = np.zeros(table_set.n_materials, np.float32)
    np.maximum.at(
        max_density, materials_0based.reshape(-1), den.reshape(-1)
    )
    heavy, soft_max_density = split_heavy_voxels(
        table_set, materials_0based, den,
        air_material=air_material, soft_quantile=soft_quantile,
    )
    woodcock = build_woodcock_table(table_set, max_density, soft_max_density)
    volume = make_voxel_volume(
        materials_0based, den, voxel_size_cm,
        air_material=air_material, heavy_mask=heavy,
    )
    return volume, woodcock


def _unpack(word: jnp.ndarray, den_scale: jnp.ndarray):
    mat = (word >> _MAT_SHIFT).astype(jnp.int32)
    k_air = ((word >> _AIR_SHIFT) & 7).astype(jnp.int32)
    k_soft = ((word >> _SOFT_SHIFT) & 7).astype(jnp.int32)
    den = (word & _DEN_MASK).astype(jnp.float32) * den_scale
    return mat, k_air, k_soft, den


def _move_to_bbox(px, py, pz, dx, dy, dz, bbox):
    """Translate particles from the focal spot onto the bbox surface
    (slightly inside); returns new positions and a hit flag.
    Port of the ray/box entry logic (kernel :714-805): for each axis the
    distance to the *entry* plane is 0 when already past it, and the largest
    of the three distances is the wall crossed to enter the box."""

    def axis_dist(p, d, size):
        dist_pos = jnp.where(p > 0.0, 0.0, EPS_SOURCE + (-p) / d)
        dist_neg = jnp.where(p < size, 0.0, EPS_SOURCE + (size - p) / d)
        return jnp.where(
            d > EPS_SOURCE, dist_pos, jnp.where(d < -EPS_SOURCE, dist_neg, NEG_INF)
        )

    tx = axis_dist(px, dx, bbox[0])
    ty = axis_dist(py, dy, bbox[1])
    tz = axis_dist(pz, dz, bbox[2])
    t = jnp.maximum(jnp.maximum(tx, ty), tz)
    t = jnp.maximum(t, 0.0)

    nx_, ny_, nz_ = px + t * dx, py + t * dy, pz + t * dz
    inside = (
        (nx_ >= 0.0) & (nx_ <= bbox[0])
        & (ny_ >= 0.0) & (ny_ <= bbox[1])
        & (nz_ >= 0.0) & (nz_ <= bbox[2])
    )
    # outside and not pointing at the box: stay at the focal spot
    return (
        jnp.where(inside, nx_, px),
        jnp.where(inside, ny_, py),
        jnp.where(inside, nz_, pz),
        inside,
    )


def _locate_voxel(px, py, pz, volume: VoxelVolume):
    """Voxel flat index at the position, or in_bbox=False when escaped
    (EPS margins as in the reference)."""
    bbox = volume.bbox
    in_bbox = (
        (px >= EPS_SOURCE) & (px <= bbox[0] - EPS_SOURCE)
        & (py >= EPS_SOURCE) & (py <= bbox[1] - EPS_SOURCE)
        & (pz >= EPS_SOURCE) & (pz <= bbox[2] - EPS_SOURCE)
    )
    nx, ny, _ = volume.shape
    vx = jnp.clip((px / volume.voxel_size[0]).astype(jnp.int32), 0, volume.shape[0] - 1)
    vy = jnp.clip((py / volume.voxel_size[1]).astype(jnp.int32), 0, volume.shape[1] - 1)
    vz = jnp.clip((pz / volume.voxel_size[2]).astype(jnp.int32), 0, volume.shape[2] - 1)
    return vx + vy * nx + vz * (nx * ny), in_bbox


def _tally_pixel(px, py, pz, dx, dy, dz, detector: DetectorGeom, n_pixels_x: int,
                 n_pixels_z: int):
    """Detector-plane intersection and pixel index for escaped particles
    (kernel :482-604, rotated-detector branch). Returns (pixel_flat, hit)."""
    sdir = detector.source_direction
    cos_angle = dx * sdir[0] + dy * sdir[1] + dz * sdir[2]
    moving_towards = cos_angle >= TALLY_MIN_COS_ANGLE

    safe_cos = jnp.where(moving_towards, cos_angle, 1.0)
    dist = (
        sdir[0] * (detector.center[0] - px)
        + sdir[1] * (detector.center[1] - py)
        + sdir[2] * (detector.center[2] - pz)
    ) / safe_cos
    hx = px + dist * dx
    hy = py + dist * dy
    hz = pz + dist * dz

    r = detector.rot_inv
    rx = r[0, 0] * hx + r[0, 1] * hy + r[0, 2] * hz
    rz = r[2, 0] * hx + r[2, 1] * hy + r[2, 2] * hz

    ix = jnp.floor((rx - detector.corner_min[0]) * detector.inv_pixel_size_x).astype(
        jnp.int32
    )
    iz = jnp.floor((rz - detector.corner_min[2]) * detector.inv_pixel_size_z).astype(
        jnp.int32
    )
    hit = (
        moving_towards
        & (ix >= 0) & (ix < n_pixels_x)
        & (iz >= 0) & (iz < n_pixels_z)
    )
    return ix + iz * n_pixels_x, hit


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # defaults from the TPU v5e parameter sweep (see bench.py)
    n_lanes: int = 1 << 17  # photon lanes per device
    max_virtual_trips: int = 16  # inner Woodcock flights per outer iteration
    max_outer_iterations: int = 1 << 30  # safety cap
    # event resolutions per outer iteration (must divide max_virtual_trips).
    # With 1, a lane that hits a real event early in the flight unroll idles
    # until the end of the iteration (measured ~14% of all flight slots);
    # with 2, events from the first half resolve mid-iteration and the lane
    # resumes flying immediately (majorants are analytic since v3.4, so the
    # resume needs no table refresh)
    n_resolves: int = 2
    # Real events are compacted into a batch of n_lanes * event_fraction
    # lanes per resolve; events beyond the budget simply stay pending (the
    # photon waits at its interaction site). The sampler cost scales with
    # the BUDGET, not the fill - size it just above the measured events
    # per resolve (~0.29 * n_lanes per resolve at n_resolves=2 on CT
    # scenes at steady state; 0.18 measurably starves and clogs lanes,
    # costing ~25% throughput)
    event_fraction: float = 0.35
    # tally energy deposited per voxel and per material (KERMA approximation,
    # as the reference: electrons are not transported;
    # MC-GPU_kernel_v1.3.cu:391-443, 1522-1563). Adds a voxel-sized f32
    # accumulator to the carry.
    tally_dose: bool = False
    # use the air-clearance fast path (disable for A/B physics validation)
    air_skip: bool = True
    # use the soft-majorant clearance tier (disable for A/B validation or
    # when the volume was built without a heavy mask)
    soft_skip: bool = True
    # counter-based PRNG for the bulk uniforms: "rbg" (XLA RngBitGenerator,
    # fastest on TPU) or None to inherit the caller's key implementation
    # (threefry by default - bit-reproducible across backends)
    rng_impl: str | None = "rbg"
    # sample the Compton scattering angle from the tabulated inverse CDF
    # (one row gather + lerp; engine v3.4b) instead of the 16-trip GCOa
    # tau rejection. False restores the analytic rejection path (used for
    # the chi-square A/B validation in tests/test_sampler_statistics.py)
    tau_table: bool = True

    # ---- engine v4: resolve-in-place (see run_projection docstring) ------
    # Resolve real events masked over ALL lanes instead of on a stream-
    # compacted batch, and tally ONCE per outer iteration. The v3.4
    # compaction existed because per-lane event-table gathers price per
    # index; with gather-free sigma (sigma_mode="cheb"), the fused
    # Compton|Rayleigh angle ICDF and MXU shell fetches, a full-width
    # masked resolve is cheaper than the compaction scatters it replaces
    # (the [n, 2] event scatter-back alone priced ~46 ns/row,
    # runs/microbench.json). False restores the engine v3.4 body exactly
    # (A/B validation; also required when tau_table=False).
    resolve_inplace: bool = True
    # "cheb": per-material Chebyshev+K-edge fits of the partial inverse
    # MFPs, evaluated with Clenshaw + one one-hot MXU coefficient fetch
    # (max rel. error <~3e-4, tests/test_tables_v4.py). "table": the v3
    # fused-index (a, b) row gathers. v4 only.
    sigma_mode: str = "cheb"
    # "cdf": broadcast-compare inverse-CDF spectrum sampling (gather-free);
    # "alias": the v3 Walker-alias row gather. v4 only.
    spectrum_mode: str = "cdf"
    # "icdf": Rayleigh angle from the tabulated inverse CDF (one fused
    # gather shared with Compton); "rita": full-width masked RITA rejection
    # (A/B validation path). v4 only.
    rayleigh_mode: str = "icdf"
    # gather the packed voxel words from a [n_vox/2, 2] paired layout
    # (row gathers price ~8.6 ns/idx where the flat u32 gather prices
    # ~12-15 ns at 500 MB; the column select is a free where). v4 only.
    paired_voxel_gather: bool = True

    @property
    def event_lanes(self) -> int:
        return max(1024, int(self.n_lanes * self.event_fraction))

    @property
    def rayleigh_lanes(self) -> int:
        # Rayleigh is ~an order of magnitude rarer than Compton
        return max(1024, int(self.n_lanes * self.event_fraction / 6))

    # budget fraction of the compacted second tally pass (lanes holding
    # both a stash and a parked record in one sub-phase); overflow is
    # carried, not dropped, so a low budget only trades a little lane
    # utilisation
    doubles_fraction: float = 0.25

    @property
    def doubles_lanes(self) -> int:
        return max(32, int(self.n_lanes * self.doubles_fraction))


def production_engine_config(
    best_config_path: str | None = "/root/repo/runs/sweep/best_config.json",
    **overrides,
) -> EngineConfig:
    """The tuned production EngineConfig: the recorded sweep winner
    (scripts/sweep_engine_configs.py writes runs/sweep/best_config.json)
    when available, else the engine-v4 tuned fallback (T=2 flights x 2
    resolves at 64k lanes, 1.24e7 hist/s — the measured v5e optimum;
    small lane batches both raise flight-slot utilisation and lower the
    effective per-index gather cost, runs/sweep_v4_d.log)."""
    import json

    base = dict(n_lanes=1 << 16, max_virtual_trips=2, n_resolves=2)
    if best_config_path:
        try:
            with open(best_config_path) as f:
                base = json.load(f)["config"]
        except (OSError, KeyError, ValueError, TypeError):
            pass
    base.update(overrides)
    return EngineConfig(**base)


def _flight_pair_tables(tables: DeviceTables) -> jnp.ndarray:
    """Flat total inverse-MFP table addressed by a fused
    (energy-bin, material) index: ``sig_pair f32[n_bins*n_mats, 2]`` with
    ``inv_mfp(E) = a + E*b`` at ``idx = ebin * n_mats + mat``.

    The flight loop gathers the 2-wide (a, b) row per lane-trip directly at
    the fused index instead of materialising a per-lane [n_mats]-wide row
    and one-hot-selecting per trip: the one-hot form re-reads ~180 MB of
    row data per trip at 1M lanes (XLA rematerialises the select chain into
    every unrolled flight), while the direct gather prices ~a few ns per
    lane against a ~4 MB table. The MAJORANT tiers, by contrast, are pure
    functions of energy and are evaluated as conservative log-polynomials
    (WoodcockTable.*_logpoly) - engine v3.4 removed their per-lane gathers
    entirely."""
    n_mats = tables.n_mats
    return tables.mfp_total_ab.reshape(-1, n_mats, 2).reshape(-1, 2)


def _event_pair_table(tables: DeviceTables) -> jnp.ndarray:
    """Flat event table f32[n_bins*n_mats, 6] at ``idx = ebin*n_mats+mat``:
    (compton_a, compton_b, rayleigh_a, rayleigh_b, S(E,pi), pmax(bin+1)).
    One 6-wide gather per compacted event batch replaces the [c_e, 6*n_mats]
    row materialisation + six one-hot selects."""
    n_mats = tables.n_mats
    cr = tables.mfp_cr_ab.reshape(-1, n_mats, 4)
    n_bins = cr.shape[0]
    s0 = tables.compton_s0.reshape(n_bins, n_mats)
    pmax = tables.rayleigh_pmax.reshape(n_bins, n_mats)
    pmax_next = jnp.concatenate([pmax[1:], pmax[-1:]], axis=0)
    return jnp.concatenate(
        [cr, s0[:, :, None], pmax_next[:, :, None]], axis=2
    ).reshape(-1, 6)


def _shell_cat_table(tables: DeviceTables) -> jnp.ndarray:
    """Concatenated Compton shell table [n_mats, 3*max_shells] with the
    +inf shell padding replaced by a large finite value so the one-hot MXU
    gather stays NaN-free (0 * inf = nan)."""
    ui = jnp.where(jnp.isinf(tables.shell_ui), 1.0e30, tables.shell_ui)
    return jnp.concatenate([tables.shell_f, ui, tables.shell_j0], axis=1)


def _compact_indices(mask: jnp.ndarray, budget: int, fill: int):
    """Stream-compact the True lanes of ``mask`` into an index batch of
    static size ``budget`` (cumsum + one scatter; jnp.nonzero lowers to a
    much slower path on TPU). Lanes beyond the budget stay unselected.
    Returns (idx [budget] with ``fill`` marking empty slots, order)."""
    n = mask.shape[0]
    order = jnp.cumsum(mask.astype(jnp.int32)) - 1
    pos = jnp.where(mask & (order < budget), order, budget)
    idx = (
        jnp.full((budget + 1,), fill, jnp.int32)
        .at[pos]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:budget]
    )
    return idx, order


class LaneState(NamedTuple):
    """Per-lane photon state surviving a budget-exhausted engine call.

    Passing the returned carry into the next chunk's ``carry_in`` removes
    the low-occupancy drain tail (the iterations that finish stragglers
    after the history budget is spent) from every chunk but the last one
    of a projection."""

    @classmethod
    def empty(cls, n_lanes: int, n_pixels: int) -> "LaneState":
        """Cold lane state (all lanes dead), bit-identical to the engine's
        own init in run_projection — pass as ``carry_in`` for the first
        chunk so intermediate and first chunks share one trace."""
        z = jnp.zeros((n_lanes,), jnp.float32)
        zi = jnp.zeros((n_lanes,), jnp.int32)
        zb = jnp.zeros((n_lanes,), bool)
        return cls(
            px=z, py=z, pz=z,
            dx=z, dy=jnp.ones((n_lanes,), jnp.float32), dz=z,
            energy=jnp.full((n_lanes,), 1.0e4, jnp.float32),
            ebin=zi, scatter=zi, alive=zb, pending=zb,
            k_air=zi, k_soft=zi, vox=zi, mat_evt=zi, xi=z,
            # parked-record sentinel: one past the 4-class image, so a
            # masked scatter-add drops it (matches run_projection's init)
            stash_idx=jnp.full((n_lanes,), 4 * n_pixels, jnp.int32),
            stash_energy=z,
            stash_valid=zb,
        )

    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray
    energy: jnp.ndarray
    ebin: jnp.ndarray
    scatter: jnp.ndarray
    alive: jnp.ndarray
    pending: jnp.ndarray
    k_air: jnp.ndarray
    k_soft: jnp.ndarray
    vox: jnp.ndarray
    mat_evt: jnp.ndarray
    # scaled event uniform xi = (u - p_delta) / (mfp_samp * den): the event
    # branch is Compton iff xi < inv_mfp_compton, Rayleigh iff
    # xi < inv_compton + inv_rayleigh - one value replaces the
    # (randno, prob_delta, mfp_density) triple of engine v3.2
    xi: jnp.ndarray
    # detector records carried across an iteration boundary when the
    # rare-doubles tally budget overflowed (engine v3.4 compacted tally)
    stash_idx: jnp.ndarray
    stash_energy: jnp.ndarray
    stash_valid: jnp.ndarray


@partial(
    jax.jit,
    static_argnames=(
        "n_pixels_x", "n_pixels_z", "config", "return_stats", "return_carry"
    ),
)
def run_projection(
    tables: DeviceTables,
    woodcock: WoodcockTable,
    volume: VoxelVolume,
    source: FanBeamSource,
    detector: DetectorGeom,
    n_histories: jnp.ndarray,  # i32 scalar (<= 2^31-1; host chunks larger runs)
    key: jax.Array,
    n_pixels_x: int,
    n_pixels_z: int,
    config: EngineConfig = EngineConfig(),
    return_stats: bool = False,
    carry_in: LaneState | None = None,
    return_carry: bool = False,
) -> jnp.ndarray:
    """Simulate one projection; returns the detector image
    f32[4, n_pixels_z, n_pixels_x] with per-pixel deposited energy [eV] for
    (primary, Compton, Rayleigh, multi-scatter).

    When ``config.tally_dose`` or ``return_stats`` is set, returns
    ``(image, extras)`` instead, with extras containing ``voxel_dose``
    (f32[n_voxels], eV), ``material_dose`` (f32[n_materials, 2]: eV and
    eV^2 for uncertainty) and/or ``iterations``/``remaining`` counters.

    Lane management: every iteration pre-samples one *candidate* photon per
    lane; a lane whose photon escapes mid-iteration stashes its detector
    record and immediately adopts the candidate (its majorant MFPs were
    prefetched alongside), so flight slots stay busy instead of idling
    until the next refill. The stash is depth 1 per flight sub-phase: with
    ``config.n_resolves`` > 1 it is flushed at every mid-iteration event
    resolution, and lanes whose Compton event resolved mid-iteration resume
    flying immediately with refreshed majorant MFPs.

    Chunked runs: pass ``return_carry=True`` to stop as soon as the budget
    is spent (skipping the low-occupancy drain tail) and receive the
    surviving photon state in ``extras["carry"]``; feed it to the next
    chunk of the SAME projection via ``carry_in``. The final chunk runs
    without ``return_carry`` and drains every survivor."""
    n = config.n_lanes
    n_mats = tables.n_mats
    npix = n_pixels_x * n_pixels_z
    n_voxels = volume.packed.shape[0]

    sig_pair = _flight_pair_tables(tables)
    event_pair = _event_pair_table(tables)
    shell_cat = _shell_cat_table(tables)
    s_max = tables.max_shells
    n_bins = woodcock.a.shape[0]
    mat_iota = jnp.arange(n_mats, dtype=jnp.int32)[None, :]

    use_v4 = config.resolve_inplace
    if use_v4 and not config.tau_table:
        raise ValueError(
            "resolve_inplace requires tau_table=True; set "
            "resolve_inplace=False for the analytic-tau A/B path"
        )
    if use_v4:
        from cbctmc_tpu.engine.tables import eval_sigma_partials, sigma_coeff_table

        sigma_coeffs = sigma_coeff_table(tables)
        # fused Compton|Rayleigh angular inverse CDF: one gather serves both
        icdf_cat = jnp.concatenate(
            [tables.compton_icdf, tables.rayleigh_icdf], axis=0
        )
        n_icdf_rows = tables.compton_icdf.shape[0]
        packed_pairs = volume.packed_pairs

    if config.rng_impl is not None:
        # derive a fast counter-based key for the bulk uniforms from the
        # caller's key (sequence splitting as in the reference's RANECU
        # leap-frog, MC-GPU_kernel_v1.3.cu:812-894, but counter-based).
        # The full 128-bit key state is derived (not a 32-bit seed) so
        # independent chunks cannot birthday-collide onto identical streams.
        key_data = jax.random.bits(key, (4,), jnp.uint32)
        key = jax.random.wrap_key_data(key_data, impl=config.rng_impl)

    def ebin_of(energy):
        return jnp.clip(
            ((energy - tables.e0) * tables.ide).astype(jnp.int32),
            -1,
            n_bins - 1,
        )

    # majorant tiers as conservative log-polynomials in normalised log
    # energy (engine v3.4): exp(poly(t)) <= the tabulated majorant curve
    # everywhere (tables.fit_log_mfp_poly), so delta tracking stays
    # unbiased while the per-lane majorant-table GATHERS of v3.2 (two full
    # 2-wide gathers per tier per iteration, plus the event-batch refresh
    # scatter) become ~25 register FMAs + three exps - free VPU work
    inv_log_range = 1.0 / (woodcock.log_e_hi - woodcock.log_e_lo)
    inv_air_den = 1.0 / volume.air_den_max

    def majorants_of(energy):
        """Per-lane majorant MFPs (full Woodcock, air, soft tier)."""
        t = jnp.clip(
            (jnp.log(energy) - woodcock.log_e_lo) * inv_log_range, 0.0, 1.0
        )

        def horner(coeffs):
            acc = jnp.full_like(t, coeffs[0])
            for k in range(1, coeffs.shape[0]):
                acc = acc * t + coeffs[k]
            return acc

        mfp_wc = jnp.exp(horner(woodcock.wc_logpoly))
        mfp_air = jnp.exp(horner(woodcock.air_logpoly)) * inv_air_den
        if config.soft_skip:
            mfp_soft = jnp.exp(horner(woodcock.soft_logpoly))
        else:
            mfp_soft = mfp_wc
        return mfp_wc, mfp_air, mfp_soft

    zeros = jnp.zeros((n,), jnp.float32)

    state = dict(
        px=zeros, py=zeros, pz=zeros,
        dx=zeros, dy=jnp.ones((n,), jnp.float32), dz=zeros,
        energy=jnp.full((n,), 1.0e4, jnp.float32),
        ebin=jnp.zeros((n,), jnp.int32),
        scatter=jnp.zeros((n,), jnp.int32),
        alive=jnp.zeros((n,), bool),
        # pending real event: lane paused at an interaction site
        pending=jnp.zeros((n,), bool),
        k_air=jnp.zeros((n,), jnp.int32),
        k_soft=jnp.zeros((n,), jnp.int32),
        vox=jnp.zeros((n,), jnp.int32),
        mat_evt=jnp.zeros((n,), jnp.int32),
        xi=zeros,  # scaled event uniform (see LaneState.xi)
        # overflow-carried detector records (compacted-tally rare doubles)
        stash_idx=jnp.full((n,), 4 * npix, jnp.int32),
        stash_energy=zeros,
        stash_valid=jnp.zeros((n,), bool),
        remaining=jnp.asarray(n_histories, jnp.int32),
        image=jnp.zeros((4 * npix,), jnp.float32),
        key=key,
        it=jnp.int32(0),
    )
    if carry_in is not None:
        state.update(carry_in._asdict())
    if return_stats:
        # v3.4 compacted-tally layout: [0] detector records tallied
        # (combined stash/parked primary pass + rare-doubles pass),
        # [1] unused, [2] compton, [3] rayleigh, [4] photoelectric,
        # [5] refills, [6] adoptions, [7] flight-slots active,
        # [8] detector energy tallied, [9] unused
        state["counts"] = jnp.zeros((10,), jnp.float32)
    if config.tally_dose:
        state["voxel_dose"] = jnp.zeros((n_voxels,), jnp.float32)
        state["material_dose"] = jnp.zeros((n_mats, 2), jnp.float32)

    def cond(s):
        # drain mode also flushes overflow-carried stash records (they are
        # tallied by the next iteration's primary pass); with return_carry
        # they ride out in LaneState instead
        live = (s["remaining"] > 0) if return_carry else (
            (s["remaining"] > 0) | s["alive"].any() | s["stash_valid"].any()
        )
        return live & (s["it"] < config.max_outer_iterations)

    R = max(1, config.n_resolves)
    if config.max_virtual_trips % R:
        raise ValueError("n_resolves must divide max_virtual_trips")
    t_sub = config.max_virtual_trips // R

    def body(s):
        # v4 additionally draws 2 keys per mid-iteration refill (below)
        n_keys = 6 + 3 * R + (2 * (R - 1) if use_v4 else 0)
        keys = jax.random.split(s["key"], n_keys)
        key, k_src_e, k_src_d, k_cand_e, k_cand_d, k_step = (
            keys[0], keys[1], keys[2], keys[3], keys[4], keys[5]
        )
        res_keys = keys[6 : 6 + 3 * R]
        mid_keys = keys[6 + 3 * R :]

        # ---------------- 1. refill dead lanes + candidate pool -----------
        dead = ~s["alive"]

        def _budget_all(dead):
            return dead

        def _budget_ordered(dead):
            order = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
            return dead & (order < s["remaining"])

        # the cumsum ordering only matters for the last < n_lanes histories
        want = jax.lax.cond(
            s["remaining"] >= n, _budget_all, _budget_ordered, dead
        )

        def sample_photons(ke, kd):
            if use_v4 and config.spectrum_mode == "cdf":
                e = samplers.sample_spectrum_energy_cdf(ke, tables, n)
            else:
                e = samplers.sample_spectrum_energy(ke, tables, n)
            sdx, sdy, sdz, ok = samplers.sample_source_direction(kd, source, n)
            sx, sy, sz, _ = _move_to_bbox(
                source.position[0] * jnp.ones((n,), jnp.float32),
                source.position[1] * jnp.ones((n,), jnp.float32),
                source.position[2] * jnp.ones((n,), jnp.float32),
                sdx, sdy, sdz, volume.bbox,
            )
            return e, (sdx, sdy, sdz), (sx, sy, sz), ok

        # two independent photon pools: one fills lanes dead at the
        # iteration boundary, the other feeds mid-iteration adoption (a
        # shared pool starves adoption: every refilled lane loses its
        # candidate, killing lane utilisation)
        e_ref, rdir, rpos, ref_ok = sample_photons(k_src_e, k_src_d)
        e_cand, (ndx, ndy, ndz), (bpx, bpy, bpz), dir_ok = sample_photons(
            k_cand_e, k_cand_d
        )
        ebin_cand = ebin_of(e_cand)
        refill = want & ref_ok  # unsampled lanes retry next iteration
        n_started = jnp.sum(refill.astype(jnp.int32))

        px = jnp.where(refill, rpos[0], s["px"])
        py = jnp.where(refill, rpos[1], s["py"])
        pz = jnp.where(refill, rpos[2], s["pz"])
        dx = jnp.where(refill, rdir[0], s["dx"])
        dy = jnp.where(refill, rdir[1], s["dy"])
        dz = jnp.where(refill, rdir[2], s["dz"])
        energy = jnp.where(refill, e_ref, s["energy"])
        ebin = jnp.where(refill, ebin_of(e_ref), s["ebin"])
        scatter = jnp.where(refill, 0, s["scatter"])
        alive = s["alive"] | refill
        pending = s["pending"] & ~refill
        remaining = s["remaining"] - n_started
        # refilled lanes enter at the volume wall, i.e. (almost always)
        # outside the non-air box: the analytic-air flight branch covers the
        # crossing, so no clearance lookup is needed at the entry point
        k_air = jnp.where(refill, 0, s["k_air"]) if config.air_skip else (
            jnp.zeros((n,), jnp.int32)
        )
        k_soft = jnp.where(refill, 0, s["k_soft"]) if config.soft_skip else (
            jnp.zeros((n,), jnp.int32)
        )

        # each lane whose photon has not been consumed by the refill holds a
        # pre-sampled candidate for mid-iteration adoption; adoption is only
        # allowed while the budget cannot be overdrawn (remaining >= n at
        # the start of a flight caps the <= n adoptions of that flight; the
        # guard is evaluated per flight from the carried counter so that
        # mid-iteration refills cannot combine with adoption into an
        # overdraw)
        cand_free0 = dir_ok

        def _mid_refill(fs, ke, kd):
            """Engine v4: refill dead (absorbed / never-started) lanes at a
            sub-phase boundary so they do not idle until the next iteration
            top. Source sampling is gather-free (~2 ns/lane), so the extra
            pool costs ~nothing against the voxel gathers the revived lanes
            make productive. Parked lanes (escaped, record untallied) are
            excluded - their frozen state feeds the iteration-end tally."""
            (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive, pending,
             escaped, k_air, k_soft, vox, mat_evt, xi, stash_idx,
             stash_energy, stash_valid, cand_free, remaining) = fs
            dead = ~alive & ~escaped

            def _all(d):
                return d

            def _ordered(d):
                order = jnp.cumsum(d.astype(jnp.int32)) - d.astype(jnp.int32)
                return d & (order < remaining)

            want_mid = jax.lax.cond(remaining >= n, _all, _ordered, dead)
            e_m, mdir, mpos, ok_m = sample_photons(ke, kd)
            ref = want_mid & ok_m
            started = jnp.sum(ref.astype(jnp.int32))
            px = jnp.where(ref, mpos[0], px)
            py = jnp.where(ref, mpos[1], py)
            pz = jnp.where(ref, mpos[2], pz)
            dx = jnp.where(ref, mdir[0], dx)
            dy = jnp.where(ref, mdir[1], dy)
            dz = jnp.where(ref, mdir[2], dz)
            energy = jnp.where(ref, e_m, energy)
            ebin = jnp.where(ref, ebin_of(e_m), ebin)
            scatter = jnp.where(ref, 0, scatter)
            alive = alive | ref
            k_air = jnp.where(ref, 0, k_air)
            k_soft = jnp.where(ref, 0, k_soft)
            fs = (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive,
                  pending, escaped, k_air, k_soft, vox, mat_evt, xi,
                  stash_idx, stash_energy, stash_valid, cand_free,
                  remaining - started)
            return fs, started

        # ---------------- 2. Woodcock virtual-event flights --------------
        # (the majorant tiers are evaluated analytically inside each flight
        # - engine v3.4; the per-iteration majorant gathers of v3.2 and the
        # candidate-pool majorant prefetch are gone)
        # one RngBitGenerator call for all flights' uniforms (per-flight RNG
        # ops would break kernel fusion across the unrolled flight chain)
        u_flights = uniform_open(k_step, (2 * config.max_virtual_trips, n))
        active_slots = []  # per-flight utilization (unrolled-loop closure)

        def flight(fs, u_step, u_int):
            (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive, pending,
             escaped, k_air, k_soft, vox,
             mat_evt, xi, stash_idx,
             stash_energy, stash_valid, cand_free, remaining) = fs
            active = alive & ~pending
            if return_stats:
                active_slots.append(jnp.sum(active.astype(jnp.int32)))
            mfp_wc, mfp_air, mfp_soft = majorants_of(energy)

            if config.air_skip:
                # outside the non-air box: pure air up to the box face (or
                # forever if the ray misses), so one exponential flight with
                # the air majorant, clamped at the box entry (null event)
                lo, hi = volume.nonair_lo, volume.nonair_hi
                outside = (
                    (px < lo[0]) | (px > hi[0])
                    | (py < lo[1]) | (py > hi[1])
                    | (pz < lo[2]) | (pz > hi[2])
                )
                inv_d = (
                    1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12),
                    1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12),
                    1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12),
                )
                tmin = jnp.full((n,), -BIG)
                tmax = jnp.full((n,), BIG)
                for a, p in enumerate((px, py, pz)):
                    t1 = (lo[a] - p) * inv_d[a]
                    t2 = (hi[a] - p) * inv_d[a]
                    tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
                    tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
                t_box = jnp.where((tmax >= tmin) & (tmax > 0.0), tmin, BIG)
                t_box = jnp.maximum(t_box, 0.0) + 1.0e-4  # nudge past the face

                # inside the volume, three majorant tiers compete: the full
                # Woodcock majorant (unbounded step), the air majorant
                # (valid within the air-clearance box) and the soft
                # majorant (valid within the heavy-free box). Each clamped
                # tier's expected advance is mfp*(1-exp(-bound/mfp)); the
                # lane flies whichever tier advances farthest. This guard
                # matters at fine voxel grids: a clearance level of 1-3
                # voxels gives a bound far below the full majorant MFP, and
                # unconditionally taking the clamped tier degenerates into
                # per-voxel ray marching (measured 3x slower end-to-end on
                # the 500^3 CatPhan scene than no soft tier at all)
                def clamped_advance(mfp, bound):
                    return mfp * -jnp.expm1(-bound / mfp)

                b_air = (
                    (jnp.left_shift(1, k_air) - 1).astype(jnp.float32)
                    * volume.voxmin
                )
                adv_air = jnp.where(
                    k_air >= 1, clamped_advance(mfp_air, b_air), 0.0
                )
                if config.soft_skip:
                    b_soft = (
                        (jnp.left_shift(1, k_soft) - 1).astype(jnp.float32)
                        * volume.voxmin
                    )
                    adv_soft = jnp.where(
                        k_soft >= 1, clamped_advance(mfp_soft, b_soft), 0.0
                    )
                else:
                    b_soft = zeros
                    adv_soft = zeros
                use_air = (adv_air > mfp_wc) & (adv_air >= adv_soft)
                use_soft = (adv_soft > mfp_wc) & ~use_air
                mfp_in = jnp.where(
                    use_air, mfp_air, jnp.where(use_soft, mfp_soft, mfp_wc)
                )
                b_in = jnp.where(
                    use_air, b_air, jnp.where(use_soft, b_soft, BIG)
                )
                mfp_samp = jnp.where(outside, mfp_air, mfp_in)
                bound = jnp.where(outside, t_box, b_in)
            else:
                mfp_samp = mfp_wc
                bound = BIG

            raw = -mfp_samp * jnp.log(u_step)
            step = jnp.minimum(raw, bound)
            clamped = raw > bound

            px = jnp.where(active, px + step * dx, px)
            py = jnp.where(active, py + step * dy, py)
            pz = jnp.where(active, pz + step * dz, pz)
            nvox, in_bbox = _locate_voxel(px, py, pz, volume)

            cvox = jnp.clip(nvox, 0, n_voxels - 1)
            if use_v4 and config.paired_voxel_gather:
                # THE gather, paired-row form: [n_vox/2, 2] row gathers
                # price ~8.6 ns/idx vs ~12-15 ns for the flat u32 gather at
                # 500 MB (runs/microbench.json); the column select is a
                # free where (take_along_axis would be a second gather)
                vrows = packed_pairs[cvox >> 1]
                word = jnp.where((cvox & 1) == 1, vrows[:, 1], vrows[:, 0])
            else:
                word = volume.packed[cvox]  # THE gather
            mat, k_new, ks_new, den = _unpack(word, volume.den_scale)
            if use_v4 and config.sigma_mode == "cheb":
                # gather-free total inverse MFP: per-material Chebyshev
                # fits summed over the three channels (identical partials
                # feed the event branch, keeping delta tracking and branch
                # ratios exactly consistent)
                onehot_m = (mat[:, None] == mat_iota).astype(jnp.float32)
                s_c, s_r, s_p = eval_sigma_partials(
                    tables, energy, onehot_m, sigma_coeffs
                )
                inv_tot = s_c + s_r + s_p
            else:
                # one 2-wide gather against the ~4 MB fused-index table
                pair = sig_pair[jnp.clip(ebin, 0, n_bins - 1) * n_mats + mat]
                inv_tot = pair[:, 0] + energy * pair[:, 1]
            mfp_den = mfp_samp * den
            p_delta = 1.0 - mfp_den * inv_tot

            newly_escaped = active & ~in_bbox
            real = active & in_bbox & ~clamped & (u_int >= p_delta)

            pending = pending | real
            vox = jnp.where(real, nvox, vox)
            mat_evt = jnp.where(real, mat, mat_evt)
            # fold (u, p_delta, mfp*den) into the scaled event uniform:
            # xi = (u - p_delta)/(mfp*den) is uniform on (0, inv_tot] given
            # a real event, so the resolve branches directly on the partial
            # inverse MFPs (Compton iff xi < inv_compton, ...) - one carried
            # value instead of three (LaneState.xi)
            xi = jnp.where(
                real, (u_int - p_delta) / jnp.maximum(mfp_den, 1e-30), xi
            )
            k_air = jnp.where(active, k_new, k_air)
            k_soft = jnp.where(active, ks_new, k_soft)

            # ---- stash the detector record and adopt the candidate ------
            pix, hit = _tally_pixel(
                px, py, pz, dx, dy, dz, detector, n_pixels_x, n_pixels_z
            )
            rec = jnp.where(hit, scatter * npix + pix, 4 * npix)
            do_stash = newly_escaped & ~stash_valid
            stash_idx = jnp.where(do_stash, rec, stash_idx)
            stash_energy = jnp.where(do_stash, energy, stash_energy)
            stash_valid = stash_valid | do_stash

            adopt = do_stash & cand_free & (remaining >= n)
            escaped = escaped | (newly_escaped & ~do_stash)
            alive = alive & (~newly_escaped | adopt)
            cand_free = cand_free & ~adopt
            remaining = remaining - jnp.sum(adopt.astype(jnp.int32))

            px = jnp.where(adopt, bpx, px)
            py = jnp.where(adopt, bpy, py)
            pz = jnp.where(adopt, bpz, pz)
            dx = jnp.where(adopt, ndx, dx)
            dy = jnp.where(adopt, ndy, dy)
            dz = jnp.where(adopt, ndz, dz)
            energy = jnp.where(adopt, e_cand, energy)
            ebin = jnp.where(adopt, ebin_cand, ebin)
            scatter = jnp.where(adopt, 0, scatter)
            k_air = jnp.where(adopt, 0, k_air)
            k_soft = jnp.where(adopt, 0, k_soft)

            return (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive,
                    pending, escaped, k_air, k_soft,
                    vox, mat_evt, xi,
                    stash_idx, stash_energy, stash_valid, cand_free,
                    remaining)

        # the stash enters the iteration with any records the compacted
        # tally's rare-doubles budget carried over (usually none); such
        # lanes simply cannot stash again until their record is tallied
        fs = (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive, pending,
              jnp.zeros((n,), bool), k_air, k_soft, s["vox"],
              s["mat_evt"], s["xi"],
              s["stash_idx"], s["stash_energy"], s["stash_valid"],
              cand_free0, remaining)

        image = s["image"]
        counts_acc = s["counts"] if return_stats else None
        dose_state = (
            {k: s[k] for k in ("voxel_dose", "material_dose")}
            if config.tally_dose else None
        )

        if use_v4:
            # ---- engine v4: resolve-in-place, tally once per iteration ----
            for r in range(R):
                for i in range(r * t_sub, (r + 1) * t_sub):
                    fs = flight(fs, u_flights[2 * i], u_flights[2 * i + 1])
                (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive,
                 pending, escaped, k_air, k_soft, vox, mat_evt, xi,
                 stash_idx, stash_energy, stash_valid, cand_free,
                 remaining) = fs
                k_ang, k_shl, k_phi = (
                    res_keys[3 * r], res_keys[3 * r + 1], res_keys[3 * r + 2]
                )
                (dx, dy, dz, energy, ebin, scatter, alive, pending,
                 dose_state, res_counts) = _resolve_inplace(
                    dx, dy, dz, energy, ebin, scatter, alive, pending,
                    vox, mat_evt, xi, k_ang, k_shl, k_phi, dose_state,
                )
                if return_stats:
                    counts_acc = counts_acc + res_counts
                fs = (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive,
                      pending, escaped, k_air, k_soft, vox, mat_evt, xi,
                      stash_idx, stash_energy, stash_valid, cand_free,
                      remaining)
                if r < R - 1:
                    # mid-refilled histories land in the counts[6]
                    # adoption bucket (computed from the remaining-counter
                    # decrement in the shared stats block below)
                    fs, _mid_started = _mid_refill(
                        fs, mid_keys[2 * r], mid_keys[2 * r + 1]
                    )
                (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive,
                 pending, escaped, k_air, k_soft, vox, mat_evt, xi,
                 stash_idx, stash_energy, stash_valid, cand_free,
                 remaining) = fs

            # one full-lane tally per iteration: each lane contributes its
            # stash OR its parked record; the rare lanes holding BOTH carry
            # the parked record as the next iteration's stash (records are
            # never dropped; the v3.4 compacted doubles pass and its budget
            # disappear). Parked positions are frozen (alive=False lanes
            # do not move), so tallying at iteration end is exact.
            pix, hit = _tally_pixel(
                px, py, pz, dx, dy, dz, detector, n_pixels_x, n_pixels_z
            )
            tally_mask = escaped & hit
            tally_idx = jnp.where(tally_mask, scatter * npix + pix, 4 * npix)
            has_stash_rec = stash_valid & (stash_idx < 4 * npix)
            primary_idx = jnp.where(has_stash_rec, stash_idx, tally_idx)
            primary_val = jnp.where(
                has_stash_rec, stash_energy,
                jnp.where(tally_mask, energy, 0.0),
            )
            image = image.at[primary_idx].add(primary_val, mode="drop")
            doubles = has_stash_rec & tally_mask
            stash_idx = jnp.where(doubles, tally_idx, stash_idx)
            stash_energy = jnp.where(doubles, energy, stash_energy)
            stash_valid = doubles
            if return_stats:
                counts_acc = counts_acc + jnp.array([
                    jnp.sum(primary_idx < 4 * npix),
                    0, 0, 0, 0, 0, 0, 0,
                    jnp.sum(
                        jnp.where(primary_idx < 4 * npix, primary_val, 0.0)
                    ),
                    0.0,
                ], dtype=jnp.float32)

        if not use_v4:
          for r in range(R):
            for i in range(r * t_sub, (r + 1) * t_sub):
                fs = flight(fs, u_flights[2 * i], u_flights[2 * i + 1])
            (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive, pending,
             escaped, k_air, k_soft, vox,
             mat_evt, xi, stash_idx,
             stash_energy, stash_valid, cand_free, remaining) = fs

            # ------------ 4. compacted tally (engine v3.4) ----------------
            # A lane holds at most two records per sub-phase: its stash
            # (first escape before adopting) and its parked photon (second
            # escape). The v3.2 tally scattered 2n concatenated slots, most
            # of them dropped sentinels - but scatter-adds into the 23 MB
            # image price ~9 ns per SLOT, valid or not (measured; the
            # biggest single cost in the v3.2 census). Instead: one n-slot
            # scatter carries each lane's stash OR parked record, and the
            # rare lanes holding BOTH go through a small stream-compacted
            # second pass. Doubles beyond that budget keep their parked
            # record as the next sub-phase's stash (overflow-carry in the
            # outer state) - records are never dropped.
            pix, hit = _tally_pixel(
                px, py, pz, dx, dy, dz, detector, n_pixels_x, n_pixels_z
            )
            tally_mask = escaped & hit
            tally_idx = jnp.where(tally_mask, scatter * npix + pix, 4 * npix)
            has_stash_rec = stash_valid & (stash_idx < 4 * npix)
            primary_idx = jnp.where(has_stash_rec, stash_idx, tally_idx)
            primary_val = jnp.where(
                has_stash_rec, stash_energy,
                jnp.where(tally_mask, energy, 0.0),
            )
            image = image.at[primary_idx].add(primary_val, mode="drop")

            doubles = has_stash_rec & tally_mask
            c_d = config.doubles_lanes
            idx_d, order_d = _compact_indices(doubles, c_d, fill=n)
            valid_d = idx_d < n
            idd = jnp.minimum(idx_d, n - 1)
            image = image.at[
                jnp.where(valid_d, tally_idx[idd], 4 * npix)
            ].add(jnp.where(valid_d, energy[idd], 0.0), mode="drop")
            # overflow-carry: doubles beyond the budget park their second
            # record in the stash slot for the next sub-phase
            overflow = doubles & (order_d >= c_d)
            stash_idx = jnp.where(overflow, tally_idx, stash_idx)
            stash_energy = jnp.where(overflow, energy, stash_energy)
            stash_valid = overflow

            if return_stats:
                counts_acc = counts_acc + jnp.array([
                    jnp.sum(primary_idx < 4 * npix)
                    + jnp.sum(valid_d & (tally_idx[idd] < 4 * npix)),
                    0, 0, 0, 0, 0, 0, 0,
                    jnp.sum(jnp.where(primary_idx < 4 * npix, primary_val, 0.0))
                    + jnp.sum(jnp.where(valid_d, energy[idd], 0.0)),
                    0.0,
                ], dtype=jnp.float32)

            # ------------ 5. real interactions (compacted batch) ----------
            k_comp, k_ray, k_phi = (
                res_keys[3 * r], res_keys[3 * r + 1], res_keys[3 * r + 2]
            )
            resolved = _resolve(
                px, py, pz, dx, dy, dz, energy, ebin, scatter, alive,
                pending, vox, mat_evt, xi,
                k_comp, k_ray, k_phi, dose_state,
            )
            (dx, dy, dz, energy, ebin, scatter, alive, pending,
             dose_state, res_counts) = resolved
            if return_stats:
                counts_acc = counts_acc + res_counts

            # re-enter the flight loop with parked state cleared (the stash
            # may carry an overflowed record)
            fs = (px, py, pz, dx, dy, dz, energy, ebin, scatter, alive,
                  pending, jnp.zeros((n,), bool), k_air, k_soft,
                  vox, mat_evt, xi,
                  stash_idx, stash_energy, stash_valid, cand_free, remaining)

        if return_stats:
            counts_acc = counts_acc + jnp.array([
                0, 0, 0, 0, 0, n_started,
                s["remaining"] - n_started - remaining,
                sum(active_slots, start=jnp.int32(0)), 0, 0,
            ], dtype=jnp.float32)

        extra_state = {}
        if config.tally_dose:
            extra_state.update(dose_state)
        if return_stats:
            extra_state["counts"] = counts_acc

        return dict(
            px=px, py=py, pz=pz, dx=dx, dy=dy, dz=dz,
            energy=energy, ebin=ebin, scatter=scatter,
            alive=alive, pending=pending, k_air=k_air, k_soft=k_soft,
            vox=vox,
            mat_evt=mat_evt, xi=xi,
            stash_idx=stash_idx, stash_energy=stash_energy,
            stash_valid=stash_valid,
            remaining=remaining, image=image, key=key, it=s["it"] + 1,
            **extra_state,
        )

    def _resolve(px, py, pz, dx, dy, dz, energy, ebin, scatter, alive,
                 pending, vox, mat_evt, xi,
                 k_comp, k_ray, k_phi, dose_state):
        """Resolve the currently pending real events on a stream-compacted
        batch; returns the updated lane state. Lanes whose energy changed
        resume flying immediately in the next sub-phase - their majorants
        are evaluated analytically in the flight (engine v3.4), so no
        mid-iteration refresh scatter is needed."""
        pending = pending & alive
        c_e = config.event_lanes
        idx_e, _ = _compact_indices(pending, c_e, fill=n)
        valid_e = idx_e < n
        idx_es = jnp.minimum(idx_e, n - 1)

        # ONE packed gather fetches all per-event lane state (the int
        # columns ride along bitcast to f32; scatters/gathers price per
        # index and per op, so fusing the f32 and i32 fetches halves both).
        # The v3.2 (randno, prob_delta, mfp_density) triple is folded into
        # the single scaled uniform xi at flight time, so the stack is 3
        # columns instead of 5.
        stack = jnp.concatenate(
            [
                jnp.stack([energy, xi], axis=1),
                jax.lax.bitcast_convert_type(
                    (jnp.maximum(ebin, 0) * 32 + mat_evt)[:, None], jnp.float32
                ),
            ],
            axis=1,
        )
        fv = stack[idx_es]
        e_e, xi_e = fv[:, 0], fv[:, 1]
        em_e = jax.lax.bitcast_convert_type(fv[:, 2], jnp.int32)
        ebin_e = em_e >> 5
        mat_e = em_e & 31

        # one 6-wide gather at the fused (bin, material) index fetches every
        # per-event table value
        e6 = event_pair[jnp.clip(ebin_e, 0, n_bins - 1) * n_mats + mat_e]
        onehot_e = (mat_e[:, None] == mat_iota).astype(jnp.float32)

        inv_com = e6[:, 0] + e_e * e6[:, 1]
        inv_ray = e6[:, 2] + e_e * e6[:, 3]
        want_c = valid_e & (xi_e < inv_com)
        want_r = valid_e & ~want_c & (xi_e < inv_com + inv_ray)
        photo = valid_e & ~want_c & ~want_r

        # --- Compton: masked in-batch; shell rows via one MXU matmul -----
        shell_rows = jax.lax.dot_general(
            shell_cat, onehot_e,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # HIGHEST keeps the f32 shell_f/ui/j0 operand exact on TPU (the
            # default truncates inputs to bf16, ~0.3% error in binding
            # energies); the one-hot operand makes the fetch bit-exact
            precision=jax.lax.Precision.HIGHEST,
        )  # [3*s_max, c_e] shell-major
        if config.tau_table:
            # scattering angle from the tabulated inverse CDF: one row
            # gather (stochastic interpolation between the two bracketing
            # log-energy rows, PENELOPE-style) + a linear interpolation at
            # an equal-probability knot - replaces the 16-trip tau
            # rejection and its per-trip [s_max, c_e] shell-profile math
            k_tau, k_shell = jax.random.split(k_comp)
            u2 = uniform_open(k_tau, (2, c_e))
            cdt1_c = samplers.sample_compton_cdt1_tab(u2, e_e, mat_e, tables)
            new_e_c, costh_c = samplers.compton_scatter_rows_tab(
                k_shell, e_e, cdt1_c,
                shell_rows[:s_max],
                shell_rows[s_max : 2 * s_max],
                shell_rows[2 * s_max :],
                want_c,
            )
        else:
            new_e_c, costh_c = samplers.compton_scatter_rows(
                k_comp, e_e, e6[:, 4],
                shell_rows[:s_max],
                shell_rows[s_max : 2 * s_max],
                shell_rows[2 * s_max :],
                want_c,
            )

        # --- Rayleigh: rarer; sub-compacted batch with row-fetched RITA --
        c_r = config.rayleigh_lanes
        sub, order_r = _compact_indices(want_r, c_r, fill=c_e)
        valid_r = sub < c_e
        subs = jnp.minimum(sub, c_e - 1)
        took_r = want_r & (order_r < c_r)  # over-budget lanes stay pending
        pmax_e = e6[:, 5]
        costh_r = samplers.rayleigh_scatter_rows(
            k_ray, e_e[subs], mat_e[subs], pmax_e[subs], tables, valid_r
        )

        # event outcome per batch slot -> scattered back to lanes
        new_energy_e = jnp.where(want_c, new_e_c, e_e)
        costh_e = jnp.where(want_c, costh_c, 1.0)
        costh_e = costh_e.at[sub].set(
            jnp.where(valid_r, costh_r, 1.0), mode="drop"
        )
        code_e = jnp.where(want_c, 1, jnp.where(took_r, 2, jnp.where(photo, 3, 0)))

        # one packed 2-column scatter returns the event outcome to the
        # lanes: (energy' + code*2e6, cos_theta). The branch code rides in
        # the energy column (energies stay < 2e5 eV, so round(enc/2e6)
        # recovers the code exactly and enc - code*2e6 recovers the energy
        # to < 0.5 eV - far below the 5 eV table grid). Scatter rows into
        # column-major [n, k] staging price per COLUMN-index on TPU, so
        # narrowing 6 columns (v3.2: outcome + majorant refresh) to 2 cuts
        # the dominant event-stage scatter 3x; the majorant refresh itself
        # is obsolete (analytic majorants).
        energy_before = energy
        enc_e = new_energy_e + code_e.astype(jnp.float32) * 2.0e6
        staging = jnp.stack([energy, jnp.ones((n,), jnp.float32)], axis=1)
        staging = staging.at[idx_e].set(
            jnp.stack(
                [
                    jnp.where(valid_e, enc_e, 0.0),
                    jnp.where(valid_e, costh_e, 1.0),
                ],
                axis=1,
            ),
            mode="drop",
        )
        enc = staging[:, 0]
        costh = staging[:, 1]
        code = jnp.round(enc * 5.0e-7).astype(jnp.int32)
        energy = enc - code.astype(jnp.float32) * 2.0e6
        took_compton = code == 1
        took_rayleigh = code == 2
        took_photo = code == 3

        phi = uniform_open(k_phi, (n,)) * TWO_PI
        rdx, rdy, rdz = samplers.rotate_direction(dx, dy, dz, costh, phi)
        rotate = took_compton | took_rayleigh
        dx = jnp.where(rotate, rdx, dx)
        dy = jnp.where(rotate, rdy, dy)
        dz = jnp.where(rotate, rdz, dz)

        new_ebin = ebin_of(energy)
        absorbed = took_photo | (took_compton & (new_ebin < 0))
        alive = alive & ~absorbed

        # ---------------- dose tallies (optional) -------------------------
        if config.tally_dose:
            # energy deposited: full energy for photoelectric, interaction
            # loss for Compton (electrons not transported; below-cutoff
            # residual energy is discarded as in the reference)
            edep = jnp.where(
                took_photo, energy,
                jnp.where(took_compton, energy_before - energy, 0.0),
            )
            deposit = took_photo | took_compton
            dose_idx = jnp.where(deposit, vox, n_voxels)
            voxel_dose = dose_state["voxel_dose"].at[dose_idx].add(
                jnp.where(deposit, edep, 0.0), mode="drop"
            )
            mat_idx = jnp.where(deposit, mat_evt, n_mats)
            material_dose = dose_state["material_dose"].at[mat_idx, 0].add(
                jnp.where(deposit, edep, 0.0), mode="drop"
            )
            material_dose = material_dose.at[mat_idx, 1].add(
                jnp.where(deposit, edep * edep, 0.0), mode="drop"
            )
            dose_state = {
                "voxel_dose": voxel_dose, "material_dose": material_dose
            }

        ebin = jnp.where(took_compton, new_ebin, ebin)
        scatter = jnp.where(
            took_compton,
            jnp.where(scatter == 0, COMPTON, MULTI),
            jnp.where(
                took_rayleigh,
                jnp.where(scatter == 0, RAYLEIGH, MULTI),
                scatter,
            ),
        )
        pending = pending & ~(took_compton | took_rayleigh | took_photo)

        res_counts = None
        if return_stats:
            res_counts = jnp.array([
                0, 0,
                jnp.sum(took_compton), jnp.sum(took_rayleigh),
                jnp.sum(took_photo), 0, 0, 0, 0, 0,
            ], dtype=jnp.float32)

        return (dx, dy, dz, energy, ebin, scatter, alive, pending,
                dose_state, res_counts)

    def _resolve_inplace(dx, dy, dz, energy, ebin, scatter, alive, pending,
                         vox, mat_evt, xi, k_ang, k_shl, k_phi, dose_state):
        """Engine v4 event resolution: masked over ALL lanes, no stream
        compaction and no scatter-back. Feasible because every per-event
        table access is gather-free or a single fused row gather:

        - branch partials from the per-material Chebyshev sigma fits (the
          same fits the flight used for inv_tot - exactly consistent),
        - ONE row gather into the concatenated Compton|Rayleigh angle
          inverse-CDF table serves both scatter kinds,
        - Compton shell rows via the one-hot MXU matmul,
        - Rayleigh needs nothing further: the tabulated row IS the angle.

        Replaces (per resolve) the compaction scatter, the packed lane-state
        gather, the 6-wide event-table gather and the [n, 2] scatter-back -
        the scatter-back alone priced ~16 ms per resolve at 1M lanes
        (runs/profile_r4)."""
        pending = pending & alive
        onehot_e = (mat_evt[:, None] == mat_iota).astype(jnp.float32)
        inv_com, inv_ray, _ = eval_sigma_partials(
            tables, energy, onehot_e, sigma_coeffs
        )
        want_c = pending & (xi < inv_com)
        want_r = pending & ~want_c & (xi < inv_com + inv_ray)
        took_photo = pending & ~want_c & ~want_r

        if config.rayleigh_mode == "icdf":
            u2 = uniform_open(k_ang, (2, n))
            cdt1 = samplers.sample_icdf_rows_cdt1(
                u2, energy,
                lambda j_e: (
                    jnp.where(want_r, n_icdf_rows, 0)
                    + j_e * n_mats + mat_evt
                ),
                icdf_cat, tables,
            )
            costh_ray = 1.0 - cdt1
        else:
            k_tau, k_ray = jax.random.split(k_ang)
            u2 = uniform_open(k_tau, (2, n))
            cdt1 = samplers.sample_icdf_rows_cdt1(
                u2, energy, lambda j_e: j_e * n_mats + mat_evt,
                tables.compton_icdf, tables,
            )
            pmax = tables.rayleigh_pmax[
                jnp.clip(ebin + 1, 0, n_bins - 1) * n_mats + mat_evt
            ]
            costh_ray = samplers.rayleigh_scatter_rows(
                k_ray, energy, mat_evt, pmax, tables, want_r
            )

        shell_rows = jax.lax.dot_general(
            shell_cat, onehot_e,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [3*s_max, n] shell-major
        new_e_c, costh_c = samplers.compton_scatter_rows_tab(
            k_shl, energy, cdt1,
            shell_rows[:s_max],
            shell_rows[s_max : 2 * s_max],
            shell_rows[2 * s_max :],
            want_c,
        )

        energy_before = energy
        energy = jnp.where(want_c, new_e_c, energy)
        costh = jnp.where(
            want_c, costh_c, jnp.where(want_r, costh_ray, 1.0)
        )
        phi = uniform_open(k_phi, (n,)) * TWO_PI
        rdx, rdy, rdz = samplers.rotate_direction(dx, dy, dz, costh, phi)
        rotate = want_c | want_r
        dx = jnp.where(rotate, rdx, dx)
        dy = jnp.where(rotate, rdy, dy)
        dz = jnp.where(rotate, rdz, dz)

        new_ebin = ebin_of(energy)
        absorbed = took_photo | (want_c & (new_ebin < 0))
        alive = alive & ~absorbed

        if config.tally_dose:
            edep = jnp.where(
                took_photo, energy,
                jnp.where(want_c, energy_before - energy, 0.0),
            )
            deposit = took_photo | want_c
            dose_idx = jnp.where(deposit, vox, n_voxels)
            voxel_dose = dose_state["voxel_dose"].at[dose_idx].add(
                jnp.where(deposit, edep, 0.0), mode="drop"
            )
            mat_idx = jnp.where(deposit, mat_evt, n_mats)
            material_dose = dose_state["material_dose"].at[mat_idx, 0].add(
                jnp.where(deposit, edep, 0.0), mode="drop"
            )
            material_dose = material_dose.at[mat_idx, 1].add(
                jnp.where(deposit, edep * edep, 0.0), mode="drop"
            )
            dose_state = {
                "voxel_dose": voxel_dose, "material_dose": material_dose
            }

        ebin = jnp.where(want_c, new_ebin, ebin)
        scatter = jnp.where(
            want_c,
            jnp.where(scatter == 0, COMPTON, MULTI),
            jnp.where(
                want_r,
                jnp.where(scatter == 0, RAYLEIGH, MULTI),
                scatter,
            ),
        )
        pending = jnp.zeros((n,), bool)

        res_counts = None
        if return_stats:
            res_counts = jnp.array([
                0, 0,
                jnp.sum(want_c), jnp.sum(want_r),
                jnp.sum(took_photo), 0, 0, 0, 0, 0,
            ], dtype=jnp.float32)

        return (dx, dy, dz, energy, ebin, scatter, alive, pending,
                dose_state, res_counts)

    final = jax.lax.while_loop(cond, body, state)
    image = final["image"].reshape(4, n_pixels_z, n_pixels_x)
    extras = {}
    if config.tally_dose:
        extras["voxel_dose"] = final["voxel_dose"]
        extras["material_dose"] = final["material_dose"]
    if return_stats:
        extras["iterations"] = final["it"]
        extras["remaining"] = final["remaining"]
        extras["counts"] = final["counts"]
    if return_carry:
        extras["carry"] = LaneState(*(final[k] for k in LaneState._fields))
    if extras:
        return image, extras
    return image
