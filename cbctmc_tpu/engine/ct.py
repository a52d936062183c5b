"""CT scan geometry: per-projection source and detector descriptions.

Re-derivation of the circular-trajectory setup of the reference engine
(docker/mcgpu/MC-GPU_v1.3.cu:1372-1465, 1750-1841, 3280-3434):

- the gantry rotates around the volume's Z axis; projection *angle* is the
  angle of the SOURCE position measured from +X towards +Y (the detector is
  180 deg opposite),
- the detector is centred on the beam axis at distance SDD from the focal
  spot (the half-fan lateral displacement is NOT modelled by moving the
  detector: the reference simulates a wide centred detector with an
  asymmetric fan aperture phi1/phi2 and crops the projection afterwards,
  cf. cbctmc/defaults.py:60-92 + cbctmc/mc/projection.py:46-50),
- tallying rotates escaped particles into a frame where the detector is
  perpendicular to +Y; we store that rotation per projection.

All lengths in cm (engine units), angles in radians unless noted.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import numpy as np

DEG2RAD = np.pi / 180.0


class DetectorGeom(NamedTuple):
    """Per-projection detector description (device-friendly arrays).

    When built for P projections every field has a leading [P] axis; index
    with ``jax.tree.map(lambda x: x[i], det)`` to get one projection.
    """

    center: np.ndarray  # [..., 3]
    rot_inv: np.ndarray  # [..., 3, 3] rotation detector->(+Y frame)
    corner_min: np.ndarray  # [..., 3] lower detector corner in +Y frame
    inv_pixel_size_x: np.ndarray
    inv_pixel_size_z: np.ndarray
    source_direction: np.ndarray  # [..., 3] (needed by the tally)


@dataclasses.dataclass(frozen=True)
class ScanGeometry:
    """Static description of a circular CBCT scan in engine units [cm]."""

    n_pixels_x: int
    n_pixels_z: int
    detector_size_x: float  # cm
    detector_size_z: float  # cm
    sdd: float  # source-to-detector distance [cm]
    sad: float  # source-to-rotation-axis distance [cm]
    # asymmetric in-plane fan half-angles [deg]; negative -> fit detector
    aperture_phi1: float
    aperture_phi2: float
    # axial (cone) full aperture [deg]; negative -> fit detector
    aperture_theta: float
    source_position_0: Tuple[float, float, float]  # focal spot of proj 0 [cm]
    source_direction_0: Tuple[float, float, float] = (0.0, 1.0, 0.0)

    @property
    def pixel_size_x(self) -> float:
        return self.detector_size_x / self.n_pixels_x

    @property
    def pixel_size_z(self) -> float:
        return self.detector_size_z / self.n_pixels_z

    def fan_aperture(self) -> Tuple[float, float, float]:
        """Resolve negative (fit-to-detector) apertures; returns
        (phi1, phi2, theta) in degrees."""
        phi1, phi2, theta = self.aperture_phi1, self.aperture_phi2, self.aperture_theta
        if phi1 + phi2 < 0:
            half = np.degrees(np.arctan(0.5 * self.detector_size_x / self.sdd))
            phi1 = phi2 = half
        if theta < 0:
            theta = 2.0 * np.degrees(np.arctan(0.5 * self.detector_size_z / self.sdd))
        return phi1, phi2, theta


def projection_angles_deg(
    n_projections: int,
    start_direction: Tuple[float, float, float] = (0.0, 1.0, 0.0),
    angle_between: float | None = None,
) -> np.ndarray:
    """Source angles for an evenly-spaced scan.

    The starting angle is derived from the projection-0 source direction:
    angle(source) = angle(direction) - 180 deg, so the default direction
    (0,1,0) puts the source at 270 deg — the reference convention
    (MC-GPU_v1.3.cu:3293-3303)."""
    if angle_between is None:
        angle_between = 360.0 / n_projections
    u, v = start_direction[0], start_direction[1]
    start = (np.degrees(np.arctan2(v, u)) - 180.0) % 360.0
    return start + angle_between * np.arange(n_projections)


def build_scan(
    geometry: ScanGeometry, angles_deg: Sequence[float]
) -> Tuple["FanBeamSource", DetectorGeom]:
    """Build per-projection source/detector arrays for the given source
    angles [deg, measured from +X]."""
    from cbctmc_tpu.engine.samplers import FanBeamSource

    angles = np.asarray(angles_deg, dtype=np.float64) * DEG2RAD
    n = len(angles)

    src0 = np.asarray(geometry.source_position_0, dtype=np.float64)
    dir0 = np.asarray(geometry.source_direction_0, dtype=np.float64)
    dir0 = dir0 / np.linalg.norm(dir0)
    center_rot = src0 + dir0 * geometry.sad

    # source positions/directions (rotation about Z through center_rot)
    pos = np.stack(
        [
            center_rot[0] + geometry.sad * np.cos(angles),
            center_rot[1] + geometry.sad * np.sin(angles),
            np.full(n, src0[2]),
        ],
        axis=-1,
    )
    dirs = center_rot[None, :] - pos
    dirs[:, 2] = 0.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    # detector: centred on the beam axis
    det_center = pos + dirs * geometry.sdd

    # rotation that maps the beam direction to +Y (rotation about Z only;
    # the trajectory is perpendicular to Z)
    rot_z = 0.5 * np.pi - np.arctan2(dirs[:, 1], dirs[:, 0])
    cz, sz = np.cos(rot_z), np.sin(rot_z)
    zeros, ones = np.zeros(n), np.ones(n)
    rot_inv = np.stack(
        [
            np.stack([cz, -sz, zeros], -1),
            np.stack([sz, cz, zeros], -1),
            np.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )  # [n, 3, 3]

    corner = np.einsum("nij,nj->ni", rot_inv, det_center)
    corner[:, 0] -= 0.5 * geometry.detector_size_x
    corner[:, 2] -= 0.5 * geometry.detector_size_z

    # fan-beam source rotation: +Y frame -> beam direction (inverse rotation)
    rot_fan = np.transpose(rot_inv, (0, 2, 1)).copy()

    phi1, phi2, theta = geometry.fan_aperture()
    cos_theta_low = np.cos((90.0 - 0.5 * theta) * DEG2RAD)
    d_cos_theta = -2.0 * cos_theta_low
    phi_low = (90.0 - phi1) * DEG2RAD
    d_phi = (phi1 + phi2) * DEG2RAD
    max_height = np.tan(0.5 * theta * DEG2RAD)

    source = FanBeamSource(
        position=pos.astype(np.float32),
        direction=dirs.astype(np.float32),
        rot_fan=rot_fan.astype(np.float32),
        cos_theta_low=np.full(n, cos_theta_low, np.float32),
        d_cos_theta=np.full(n, d_cos_theta, np.float32),
        phi_low=np.full(n, phi_low, np.float32),
        d_phi=np.full(n, d_phi, np.float32),
        max_height_at_y1cm=np.full(n, max_height, np.float32),
    )
    detector = DetectorGeom(
        center=det_center.astype(np.float32),
        rot_inv=rot_inv.astype(np.float32),
        corner_min=corner.astype(np.float32),
        inv_pixel_size_x=np.full(
            n, geometry.n_pixels_x / geometry.detector_size_x, np.float32
        ),
        inv_pixel_size_z=np.full(
            n, geometry.n_pixels_z / geometry.detector_size_z, np.float32
        ),
        source_direction=dirs.astype(np.float32),
    )
    return source, detector
