"""The photon-transport engine: batched Woodcock delta-tracking.

TPU-first re-design of the reference's per-thread history loop
(docker/mcgpu/MC-GPU_kernel_v1.3.cu:120-384). Instead of one CUDA thread
per history, a fixed batch of photon *lanes* is stepped in lockstep inside a
``lax.while_loop``; dead lanes (escaped / absorbed) are immediately refilled
with fresh source photons until the history budget is exhausted, so vector
utilisation stays near 100% regardless of path-length stragglers.

Each outer iteration:

1. refills dead lanes from the fan-beam source (energy via Walker alias,
   square-field direction rejection, translation to the bbox wall),
2. runs a bounded inner loop of Woodcock virtual events — a single gather
   of (material, density) + the current material's total inverse MFP per
   flight — until every live lane has escaped or reached a *real* event
   (the analogue of the reference's v1.3 "virtual interaction loop"),
3. tallies escaped lanes into the 4 scatter-separated detector images with a
   masked scatter-add (replacing atomicAdd),
4. resolves real events: Compton (PENELOPE GCOa) / Rayleigh (RITA) /
   photoelectric, by cumulative probability of the interpolated partial
   inverse MFPs.

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

# scatter states (match the reference image ordering)
PRIMARY, COMPTON, RAYLEIGH, MULTI = 0, 1, 2, 3


class VoxelVolume(NamedTuple):
    """Voxelised scene in engine units: bbox corner at the origin, voxel
    (i,j,k) spans [i*dx,(i+1)*dx) x ... Flat index = x + y*nx + z*nx*ny
    (reference: locate_voxel, kernel :1033-1065)."""

    material: jnp.ndarray  # i32 [nx*ny*nz], 0-based material index
    density: jnp.ndarray  # f32 [nx*ny*nz] [g/cm^3]
    shape: Tuple[int, int, int]  # (nx, ny, nz) static
    voxel_size: jnp.ndarray  # f32[3] [cm]
    bbox: jnp.ndarray  # f32[3] [cm]


def make_voxel_volume(
    materials_0based: np.ndarray, densities: np.ndarray, voxel_size_cm
) -> VoxelVolume:
    nx, ny, nz = materials_0based.shape
    voxel_size = np.asarray(voxel_size_cm, dtype=np.float32)
    bbox = voxel_size * np.array([nx, ny, nz], np.float32)
    # flatten with x fastest: flat = x + y*nx + z*nx*ny
    flat_mat = np.transpose(materials_0based, (2, 1, 0)).reshape(-1)
    flat_den = np.transpose(densities, (2, 1, 0)).reshape(-1)
    return VoxelVolume(
        material=jnp.asarray(flat_mat.astype(np.int32)),
        density=jnp.asarray(flat_den.astype(np.float32)),
        shape=(nx, ny, nz),
        voxel_size=jnp.asarray(voxel_size),
        bbox=jnp.asarray(bbox),
    )


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
    # Compton/Rayleigh events are compacted into a batch of
    # n_lanes * event_fraction lanes per outer iteration; events beyond the
    # budget simply stay pending (the photon waits at its interaction site),
    # which keeps the expensive shell/RITA sampling off the full lane width.
    event_fraction: float = 0.25
    # tally energy deposited per voxel and per material (KERMA approximation,
    # as the reference: electrons are not transported;
    # MC-GPU_kernel_v1.3.cu:391-443, 1522-1563). Adds a voxel-sized f32
    # accumulator to the carry.
    tally_dose: bool = False

    @property
    def event_lanes(self) -> int:
        return max(1024, int(self.n_lanes * self.event_fraction))


@partial(
    jax.jit,
    static_argnames=("n_pixels_x", "n_pixels_z", "config", "return_stats"),
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
) -> jnp.ndarray:
    """Simulate one projection; returns the detector image
    f32[4, n_pixels_z, n_pixels_x] with per-pixel deposited energy [eV] for
    (primary, Compton, Rayleigh, multi-scatter).

    When ``config.tally_dose`` or ``return_stats`` is set, returns
    ``(image, extras)`` instead, with extras containing ``voxel_dose``
    (f32[n_voxels], eV), ``material_dose`` (f32[n_materials, 2]: eV and
    eV^2 for uncertainty) and/or ``iterations``/``remaining`` counters."""
    n = config.n_lanes
    n_mats = tables.n_mats
    npix = n_pixels_x * n_pixels_z

    def ebin_of(energy):
        return jnp.clip(
            ((energy - tables.e0) * tables.ide).astype(jnp.int32),
            -1,
            woodcock.a.shape[0] - 1,
        )

    def woodcock_mfp(ebin, energy):
        safe_bin = jnp.maximum(ebin, 0)
        return woodcock.a[safe_bin] + energy * woodcock.b[safe_bin]

    zeros = jnp.zeros((n,), jnp.float32)

    state = dict(
        px=zeros, py=zeros, pz=zeros,
        dx=zeros, dy=jnp.ones((n,), jnp.float32), dz=zeros,
        energy=jnp.full((n,), 1.0e4, jnp.float32),
        ebin=jnp.zeros((n,), jnp.int32),
        mfp_wc=jnp.ones((n,), jnp.float32),
        scatter=jnp.zeros((n,), jnp.int32),
        alive=jnp.zeros((n,), bool),
        # pending real event: lane paused at an interaction site
        pending=jnp.zeros((n,), bool),
        vox=jnp.zeros((n,), jnp.int32),
        randno=zeros,  # the uniform that decided "real", reused for branching
        prob_delta=zeros,
        mfp_density=zeros,
        remaining=jnp.asarray(n_histories, jnp.int32),
        image=jnp.zeros((4 * npix,), jnp.float32),
        key=key,
        it=jnp.int32(0),
    )
    if config.tally_dose:
        state["voxel_dose"] = jnp.zeros_like(volume.density)
        state["material_dose"] = jnp.zeros((n_mats, 2), jnp.float32)

    def cond(s):
        return ((s["remaining"] > 0) | s["alive"].any()) & (
            s["it"] < config.max_outer_iterations
        )

    def body(s):
        key, k_src_e, k_src_d, k_step, k_comp, k_ray, k_phi = jax.random.split(
            s["key"], 7
        )

        # ---------------- 1. refill dead lanes ---------------------------
        dead = ~s["alive"]
        order = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
        want = dead & (order < s["remaining"])

        e_new = samplers.sample_spectrum_energy(k_src_e, tables, n)
        ndx, ndy, ndz, dir_ok = samplers.sample_source_direction(k_src_d, source, n)
        refill = want & dir_ok  # unsampled lanes retry next iteration
        bpx, bpy, bpz, _ = _move_to_bbox(
            source.position[0] * jnp.ones((n,), jnp.float32),
            source.position[1] * jnp.ones((n,), jnp.float32),
            source.position[2] * jnp.ones((n,), jnp.float32),
            ndx, ndy, ndz, volume.bbox,
        )
        n_started = jnp.sum(refill.astype(jnp.int32))

        px = jnp.where(refill, bpx, s["px"])
        py = jnp.where(refill, bpy, s["py"])
        pz = jnp.where(refill, bpz, s["pz"])
        dx = jnp.where(refill, ndx, s["dx"])
        dy = jnp.where(refill, ndy, s["dy"])
        dz = jnp.where(refill, ndz, s["dz"])
        energy = jnp.where(refill, e_new, s["energy"])
        ebin = jnp.where(refill, ebin_of(e_new), s["ebin"])
        mfp_wc = jnp.where(refill, woodcock_mfp(ebin_of(e_new), e_new), s["mfp_wc"])
        scatter = jnp.where(refill, 0, s["scatter"])
        alive = s["alive"] | refill
        pending = s["pending"] & ~refill
        remaining = s["remaining"] - n_started

        # ---------------- 2. Woodcock virtual-event flights --------------
        u_flight = uniform_open(k_step, (config.max_virtual_trips, 2, n))

        def flight(i, fs, u_step, u_int):
            px, py, pz, pending, escaped, vox, randno, prob_delta, mfp_density = fs
            active = alive & ~pending & ~escaped
            step = -mfp_wc * jnp.log(u_step)
            npx_ = jnp.where(active, px + step * dx, px)
            npy_ = jnp.where(active, py + step * dy, py)
            npz_ = jnp.where(active, pz + step * dz, pz)
            nvox, in_bbox = _locate_voxel(npx_, npy_, npz_, volume)

            mat = volume.material[nvox]
            den = volume.density[nvox]
            row = tables.mfp_total_ab[jnp.maximum(ebin, 0) * n_mats + mat]
            inv_mfp_tot = row[:, 0] + energy * row[:, 1]
            mfp_den = mfp_wc * den
            p_delta = 1.0 - mfp_den * inv_mfp_tot

            newly_escaped = active & ~in_bbox
            real = active & in_bbox & (u_int >= p_delta)

            return (
                npx_, npy_, npz_,
                pending | real,
                escaped | newly_escaped,
                jnp.where(real, nvox, vox),
                jnp.where(real, u_int, randno),
                jnp.where(real, p_delta, prob_delta),
                jnp.where(real, mfp_den, mfp_density),
            )

        fs = (px, py, pz, pending, jnp.zeros((n,), bool), s["vox"], s["randno"],
              s["prob_delta"], s["mfp_density"])
        for i in range(config.max_virtual_trips):
            fs = flight(i, fs, u_flight[i, 0], u_flight[i, 1])
        px, py, pz, pending, escaped, vox, randno, prob_delta, mfp_density = fs

        # ---------------- 3. tally escaped lanes -------------------------
        pix, hit = _tally_pixel(
            px, py, pz, dx, dy, dz, detector, n_pixels_x, n_pixels_z
        )
        tally_mask = escaped & hit
        tally_idx = jnp.where(tally_mask, scatter * npix + pix, -1)
        image = s["image"].at[tally_idx].add(
            jnp.where(tally_mask, energy, 0.0), mode="drop"
        )
        alive = alive & ~escaped

        # ---------------- 4. real interactions ---------------------------
        pending = pending & alive
        mat = volume.material[vox]
        row = tables.mfp_cr_ab[jnp.maximum(ebin, 0) * n_mats + mat]
        p_compton = prob_delta + mfp_density * (row[:, 0] + energy * row[:, 1])
        p_rayleigh = p_compton + mfp_density * (row[:, 2] + energy * row[:, 3])
        want_compton = pending & (randno < p_compton)
        want_rayleigh = pending & ~want_compton & (randno < p_rayleigh)
        is_photo = pending & ~want_compton & ~want_rayleigh

        # throttle the expensive samplers to a compact event batch; lanes
        # over budget keep waiting at their interaction site (stay pending)
        c = config.event_lanes

        def compact(mask):
            order = jnp.cumsum(mask.astype(jnp.int32)) - 1
            take = mask & (order < c)
            (idx,) = jnp.nonzero(take, size=c, fill_value=n)
            return take, idx

        take_c, idx_c = compact(want_compton)
        take_r, idx_r = compact(want_rayleigh)
        valid_c = idx_c < n
        valid_r = idx_r < n

        # compacted Compton (indices == n clamp on gather; dropped on scatter)
        new_e_c, costh_c = samplers.compton_scatter(
            k_comp, energy[idx_c], mat[idx_c], ebin[idx_c], tables, valid_c
        )
        # compacted Rayleigh
        costh_r = samplers.rayleigh_scatter(
            k_ray, energy[idx_r], mat[idx_r], ebin[idx_r], tables, valid_r
        )

        energy_before = energy
        energy = energy.at[idx_c].set(
            jnp.where(valid_c, new_e_c, 0.0), mode="drop"
        )
        costh = jnp.ones((n,), jnp.float32)
        costh = costh.at[idx_c].set(jnp.where(valid_c, costh_c, 1.0), mode="drop")
        costh = costh.at[idx_r].set(jnp.where(valid_r, costh_r, 1.0), mode="drop")

        phi = uniform_open(k_phi, (n,)) * TWO_PI
        rdx, rdy, rdz = samplers.rotate_direction(dx, dy, dz, costh, phi)
        rotate = take_c | take_r
        dx = jnp.where(rotate, rdx, dx)
        dy = jnp.where(rotate, rdy, dy)
        dz = jnp.where(rotate, rdz, dz)

        new_ebin = ebin_of(energy)
        absorbed = is_photo | (take_c & (new_ebin < 0))
        alive = alive & ~absorbed

        # ---------------- dose tallies (optional) -------------------------
        extra_state = {}
        if config.tally_dose:
            # energy deposited: full energy for photoelectric, interaction
            # loss for Compton (electrons not transported; below-cutoff
            # residual energy is discarded as in the reference)
            edep = jnp.where(
                is_photo, energy,
                jnp.where(take_c, energy_before - energy, 0.0),
            )
            deposit = is_photo | take_c
            dose_idx = jnp.where(deposit, vox, -1)
            extra_state["voxel_dose"] = s["voxel_dose"].at[dose_idx].add(
                jnp.where(deposit, edep, 0.0), mode="drop"
            )
            mat_idx = jnp.where(deposit, mat, -1)
            material_dose = s["material_dose"].at[mat_idx, 0].add(
                jnp.where(deposit, edep, 0.0), mode="drop"
            )
            extra_state["material_dose"] = material_dose.at[mat_idx, 1].add(
                jnp.where(deposit, edep * edep, 0.0), mode="drop"
            )

        ebin = jnp.where(take_c, new_ebin, ebin)
        mfp_wc = jnp.where(take_c & alive, woodcock_mfp(ebin, energy), mfp_wc)
        scatter = jnp.where(
            take_c,
            jnp.where(scatter == 0, COMPTON, MULTI),
            jnp.where(take_r, jnp.where(scatter == 0, RAYLEIGH, MULTI), scatter),
        )
        pending = pending & ~(take_c | take_r | is_photo)

        return dict(
            px=px, py=py, pz=pz, dx=dx, dy=dy, dz=dz,
            energy=energy, ebin=ebin, mfp_wc=mfp_wc, scatter=scatter,
            alive=alive, pending=pending, vox=vox, randno=randno,
            prob_delta=prob_delta, mfp_density=mfp_density,
            remaining=remaining, image=image, key=key, it=s["it"] + 1,
            **extra_state,
        )

    final = jax.lax.while_loop(cond, body, state)
    image = final["image"].reshape(4, n_pixels_z, n_pixels_x)
    extras = {}
    if config.tally_dose:
        extras["voxel_dose"] = final["voxel_dose"]
        extras["material_dose"] = final["material_dose"]
    if return_stats:
        extras["iterations"] = final["it"]
        extras["remaining"] = final["remaining"]
    if extras:
        return image, extras
    return image
