"""High-level simulation driver: multi-projection CBCT scans.

Host-side orchestration around :func:`cbctmc_tpu.engine.transport.run_projection`:

- splits history budgets into int32-safe device chunks (the reference
  default is 1.19e10 histories/projection, cbctmc/defaults.py:52),
- accumulates per-chunk tallies on device (f32) with one float64 host
  transfer per projection, pipelined against the next projection's chunks,
- normalises images to eV/cm^2 per history — the reference engine's output
  unit (report_image, MC-GPU_v1.3.cu:2860-2861),
- converts the framework's MCGeometry voxel convention into the engine
  frame using the same axis rotation the reference applies when exporting
  geometries to MC-GPU (rot90 k=3 in the xy-plane + mm->cm,
  cbctmc/mc/geometry.py:579-599) so projections match the reference's
  orientation, and
- places source and rotation centre exactly as the reference's input-file
  generator does (cbctmc/mc/simulation.py:130-136).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.engine.ct import DetectorGeom, ScanGeometry, build_scan, projection_angles_deg
from cbctmc_tpu.engine.samplers import FanBeamSource
from cbctmc_tpu.engine.tables import DeviceTables, build_device_tables
from cbctmc_tpu.engine.transport import (
    EngineConfig,
    LaneState,
    make_scene,
    run_projection,
)
from cbctmc_tpu.physics.materials import MaterialTableSet, default_material_set
from cbctmc_tpu.physics.spectrum import Spectrum, default_spectrum

logger = logging.getLogger(__name__)

MAX_CHUNK = 2_000_000_000  # int32-safe per-device history chunk

# Each device call is kept short: some runtimes kill long-running programs
# (and it bounds loss on preemption). A pilot chunk measures throughput and
# later chunks are sized to the time target.
PILOT_CHUNK = 2_000_000
TARGET_SECONDS_PER_CALL = 25.0




@dataclasses.dataclass
class SimulationParameters:
    """MC scan parameters in mm (user-facing, converted to engine cm).

    Defaults replicate the reference's Varian TrueBeam half-fan setup
    (cbctmc/defaults.py:42-96)."""

    n_histories: int = 11_903_320_312
    n_projections: int = 894
    angle_between_projections: float = 360.0 / 894
    n_detector_pixels: Tuple[int, int] = (1848, 768)
    detector_size: Tuple[float, float] = (717.024, 297.984)  # mm
    source_to_detector_distance: float = 1500.0  # mm
    source_to_isocenter_distance: float = 1000.0  # mm
    source_direction_cosines: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    source_polar_aperture: Tuple[float, float] = (
        1.481720423651376,
        13.441979314886868,
    )
    source_azimuthal_aperture: float = -1.0
    random_seed: int = 42
    projection_angles: Sequence[float] = ()


@dataclasses.dataclass
class SimulationRunInfo:
    n_histories: int
    wall_time_s: float

    @property
    def histories_per_second(self) -> float:
        return self.n_histories / max(self.wall_time_s, 1e-9)


def geometry_to_engine_frame(
    materials_1based: np.ndarray,
    densities: np.ndarray,
    image_spacing_mm: Tuple[float, float, float],
) -> Tuple[np.ndarray, np.ndarray, Tuple[float, float, float]]:
    """Rotate an MCGeometry voxel grid into the engine frame.

    The reference exports geometries to the engine with
    ``np.rot90(arr, k=3, axes=(0, 1))`` and swapped x/y spacings
    (cbctmc/mc/geometry.py:589-599); replicated here so projections and all
    downstream artifacts match bit-for-bit in orientation.
    """
    mats = np.rot90(materials_1based, k=3, axes=(0, 1))
    dens = np.rot90(densities, k=3, axes=(0, 1))
    spacing_cm = (
        image_spacing_mm[1] / 10.0,
        image_spacing_mm[0] / 10.0,
        image_spacing_mm[2] / 10.0,
    )
    return np.ascontiguousarray(mats), np.ascontiguousarray(dens), spacing_cm


class MCScanner:
    """Reusable simulator for one geometry + parameter set."""

    def __init__(
        self,
        materials_1based: np.ndarray,
        densities: np.ndarray,
        image_spacing_mm: Tuple[float, float, float],
        parameters: SimulationParameters | None = None,
        table_set: MaterialTableSet | None = None,
        spectrum: Spectrum | None = None,
        engine_config: EngineConfig | None = None,
        apply_engine_frame_rotation: bool = True,
    ):
        self.parameters = parameters or SimulationParameters()
        self.table_set = table_set or default_material_set()
        self.spectrum = spectrum or default_spectrum()
        self.engine_config = engine_config or EngineConfig()

        # original (pre-rotation) physical size, used for source placement
        # exactly as the reference does (cbctmc/mc/simulation.py:130-136)
        self._image_size_mm = tuple(
            sh * sp for sh, sp in zip(materials_1based.shape, image_spacing_mm)
        )

        if apply_engine_frame_rotation:
            mats, dens, spacing_cm = geometry_to_engine_frame(
                materials_1based, densities, image_spacing_mm
            )
        else:
            mats, dens = materials_1based, densities
            spacing_cm = tuple(s / 10.0 for s in image_spacing_mm)

        mats0 = mats.astype(np.int32) - 1
        # two-tier Woodcock majorant: full + soft (heavy-free clearance)
        self.volume, self.woodcock = make_scene(
            self.table_set, mats0, dens, spacing_cm
        )
        self.tables: DeviceTables = build_device_tables(self.table_set, self.spectrum)

        p = self.parameters
        source_position_cm = (
            self._image_size_mm[0] / 2 / 10.0,
            (self._image_size_mm[1] / 2 - p.source_to_isocenter_distance) / 10.0,
            self._image_size_mm[2] / 2 / 10.0,
        )
        self.scan_geometry = ScanGeometry(
            n_pixels_x=p.n_detector_pixels[0],
            n_pixels_z=p.n_detector_pixels[1],
            detector_size_x=p.detector_size[0] / 10.0,
            detector_size_z=p.detector_size[1] / 10.0,
            sdd=p.source_to_detector_distance / 10.0,
            sad=p.source_to_isocenter_distance / 10.0,
            aperture_phi1=p.source_polar_aperture[0],
            aperture_phi2=p.source_polar_aperture[1],
            aperture_theta=p.source_azimuthal_aperture,
            source_position_0=source_position_cm,
            source_direction_0=p.source_direction_cosines,
        )

    # ------------------------------------------------------------------
    def projection_angles(self) -> np.ndarray:
        p = self.parameters
        if len(p.projection_angles):
            return np.asarray(p.projection_angles, dtype=np.float64)
        return projection_angles_deg(
            p.n_projections,
            start_direction=p.source_direction_cosines,
            angle_between=p.angle_between_projections,
        )

    def simulate(
        self,
        angles_deg: Sequence[float] | None = None,
        n_histories: int | None = None,
        seed: int | None = None,
        progress: bool = True,
    ) -> Tuple[np.ndarray, SimulationRunInfo]:
        """Run the scan. Returns (images, info) where images is
        f64[n_projections, 4, n_pixels_z, n_pixels_x] in eV/cm^2/history."""
        p = self.parameters
        angles = (
            np.asarray(angles_deg, np.float64)
            if angles_deg is not None
            else self.projection_angles()
        )
        n_histories = int(n_histories or p.n_histories)
        seed = p.random_seed if seed is None else seed

        source, detector = build_scan(self.scan_geometry, angles)
        n_proj = len(angles)
        npx, npz = self.scan_geometry.n_pixels_x, self.scan_geometry.n_pixels_z

        images = np.zeros((n_proj, 4, npz, npx), np.float64)
        key = jax.random.PRNGKey(seed)

        # adaptive chunk size: measured on the pilot, then time-targeted.
        # The calibration syncs the device, so it runs exactly once (first
        # projection's first two chunks) and never again — later
        # projections run fully pipelined (drain(1) below)
        chunk_size = min(PILOT_CHUNK, n_histories)
        calibrated = False

        t0 = time.monotonic()
        # per-projection tallies accumulate ON DEVICE (f32; the per-chunk
        # dynamic range keeps the accumulation error orders below MC noise)
        # and transfer to the host float64 master exactly once per
        # projection - JAX's async dispatch then overlaps the host work
        # with the next projection's device chunks
        pending: list = []  # [(index, device_image)]

        def drain(limit: int):
            while len(pending) > limit:
                j, dev_img = pending.pop(0)
                images[j] += np.asarray(dev_img, np.float64)

        for i in range(n_proj):
            src_i: FanBeamSource = jax.tree.map(lambda x: jnp.asarray(x[i]), source)
            det_i: DetectorGeom = jax.tree.map(lambda x: jnp.asarray(x[i]), detector)
            done = 0
            chunk_idx = 0
            acc = None
            # a zero carry (matching the engine's fresh-state init) keeps
            # the number of distinct traces at two (carry+return_carry for
            # intermediate chunks, carry+drain for the last one)
            carry = LaneState.empty(self.engine_config.n_lanes, npx * npz)
            while done < n_histories:
                chunk = min(chunk_size, MAX_CHUNK, n_histories - done)
                last = done + chunk >= n_histories
                k = jax.random.fold_in(jax.random.fold_in(key, i), chunk_idx)
                t_chunk = time.monotonic()
                # intermediate chunks stop as soon as their budget is spent
                # and hand the surviving photons to the next chunk (the
                # drain tail then runs once per projection, not per chunk)
                out = run_projection(
                    self.tables,
                    self.woodcock,
                    self.volume,
                    src_i,
                    det_i,
                    jnp.int32(chunk),
                    k,
                    n_pixels_x=npx,
                    n_pixels_z=npz,
                    config=self.engine_config,
                    carry_in=carry,
                    return_carry=not last,
                )
                if last:
                    img = out
                else:
                    img, extras = out
                    carry = extras["carry"]
                acc = img if acc is None else acc + img
                done += chunk
                chunk_idx += 1
                if not calibrated and chunk_idx <= 2 and done < n_histories:
                    # pilot timing needs a sync; the FIRST chunk's time
                    # includes the XLA compile, so the clean rate is taken
                    # from the second chunk - later chunks run free
                    jax.block_until_ready(acc)
                    elapsed = time.monotonic() - t_chunk
                    if chunk_idx == 2 and elapsed > 0.05:
                        rate = chunk / elapsed
                        chunk_size = int(
                            max(PILOT_CHUNK, rate * TARGET_SECONDS_PER_CALL)
                        )
                        calibrated = True
            pending.append((i, acc))
            drain(1)  # keep one projection in flight
            if progress:
                logger.info(
                    "Simulating Projection %d of %d (angle %.3f deg)",
                    i + 1,
                    n_proj,
                    angles[i],
                )
        drain(0)
        wall = time.monotonic() - t0

        # normalise to eV/cm^2 per history
        pixel_area_cm2 = (
            self.scan_geometry.pixel_size_x * self.scan_geometry.pixel_size_z
        )
        images /= pixel_area_cm2 * n_histories
        info = SimulationRunInfo(
            n_histories=n_histories * n_proj, wall_time_s=wall
        )
        return images, info


def crop_half_fan(
    images: np.ndarray, n_pixels_half_fan_x: int = 1024
) -> np.ndarray:
    """Crop the wide simulated detector to the physical half-fan detector:
    flip the row axis and keep the first columns
    (reference: cbctmc/mc/projection.py:42-51)."""
    flipped = images[..., ::-1, :]
    return flipped[..., :n_pixels_half_fan_x]


def bin_detector(images: np.ndarray, factor: int) -> np.ndarray:
    """Average-pool the last two (detector) axes by ``factor`` — the
    acceptance protocol's statistics/resolution trade, applied to the RAW
    signal before log-normalisation (physically: larger pixels).

    Trailing rows/columns beyond the largest multiple of ``factor`` are
    CROPPED, which shifts the binned image's geometric center by up to
    ``(factor-1)/2`` raw pixels — use factors that divide the detector
    shape when downstream code assumes a centred detector (894/1848/768
    are all divisible by the protocol factors 2/4/8)."""
    if factor <= 1:
        return images
    v = images.shape[-2] // factor * factor
    u = images.shape[-1] // factor * factor
    a = images[..., :v, :u]
    return a.reshape(
        *a.shape[:-2], v // factor, factor, u // factor, factor
    ).mean(axis=(-3, -1))


def air_normalize(
    projections_total: np.ndarray,
    air_projection: np.ndarray,
    denoise_sigma: Tuple[float, float] | None = (10.0, 10.0),
    clip_to_air: bool = False,
) -> np.ndarray:
    """Beer-Lambert normalisation log(air / projection) with optional
    Gaussian smoothing of the air (flat-field) projection
    (reference: cbctmc/mc/projection.py:101-122)."""
    air = np.asarray(air_projection, np.float64)
    if denoise_sigma is not None:
        air = _gaussian_filter_2d(air, denoise_sigma)
    proj = np.asarray(projections_total, np.float64)
    min_nonzero = proj[proj > 0].min() if (proj > 0).any() else 1e-12
    proj = np.where(proj <= 0, min_nonzero, proj)
    if clip_to_air:
        proj = np.minimum(proj, air)
    return np.log(air / proj)


def _gaussian_filter_2d(image: np.ndarray, sigma: Tuple[float, float]) -> np.ndarray:
    """Separable Gaussian blur (last two axes) without a scipy dependency."""
    out = np.asarray(image, np.float64)
    for axis, s in zip((-2, -1), sigma):
        if s <= 0:
            continue
        radius = int(4.0 * s + 0.5)
        x = np.arange(-radius, radius + 1)
        kernel = np.exp(-0.5 * (x / s) ** 2)
        kernel /= kernel.sum()
        out = np.apply_along_axis(
            lambda m: np.convolve(
                np.pad(m, radius, mode="reflect"), kernel, mode="valid"
            ),
            axis,
            out,
        )
    return out
