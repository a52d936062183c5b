"""Shear-warp cone-beam projector pair on the MXU.

TPU-first replacement for the gather-marched ray projector in the
iterative-reconstruction data term (ROOSTER CG). The reference uses RTK's
``CudaRayCastBackProjectionImageFilter`` / Joseph forward projector
(cbctmc/reconstruction/reconstruction.py:105-121, forward_projection.py:94);
a per-ray gather march is the natural CUDA design but the worst possible
TPU design: XLA's random gather issues at ~5-9 ns/index (docs/ROOFLINE.md),
so one 894-view CG pass costs hours, and >~1e9-index gather chains in one
program kernel-fault the TPU worker (runs/r4queue3, scripts/probe_recon_r5).

This module factorises the cone-beam projection into dense batched matrix
multiplications that run on the MXU with NO data-dependent gathers:

1. quarter-turn the volume in the xy-plane (host ``np.rot90``-equivalent,
   exact permutation) so the residual gantry rotation is |theta| <= 45 deg;
2. rotate by theta with the 3-shear (Paeth) decomposition
   ``R(t) = Sx(-tan(t/2)) . Sy(sin t) . Sx(-tan(t/2))``; each shear is a
   per-row 1-D linear interpolation = a batched [n, n] matmul;
3. in the view-aligned frame the source sits at (0, -SAD, 0) and a ray to
   detector pixel (u, v) crosses the plane y = const at
   ``x = u * m(y), z = v * m(y)`` with magnification
   ``m(y) = (y + SAD) / SDD`` — i.e. per depth plane the sampling is an
   OUTER-PRODUCT grid, so the plane resampling is separable: two batched
   matmuls with hat-function (linear interpolation) matrices;
4. sum planes along y and scale by the ray path element
   ``dy * sqrt(SDD^2 + u^2 + v^2) / SDD``.

Every step is linear in the volume, so the EXACT transpose (the matched
adjoint ROOSTER's CG needs) is the same pipeline with transposed einsums in
reverse order — also all-MXU.

Conventions match recon/geometry.py: source angle alpha from +x, beam
d = -(cos a, sin a, 0), e_u = (-sin a, cos a, 0), e_v = +z; at alpha = 270
the view frame coincides with the volume frame. The xy grid must be square
(padded internally) with equal spacing and centred on the rotation axis
(the recon grids are; VolumeGrid default centres on the isocenter).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.recon.geometry import ConeBeamGeometry


def _hat(x):
    """Linear-interpolation hat weights, zero outside |x| >= 1."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _catmull_rom(x):
    """Catmull-Rom cubic kernel (a = -1/2): sharper rotation resampling
    than the linear hat — three successive linear shears blur noticeably
    near the worst-case 45 deg residual angle."""
    ax = jnp.abs(x)
    w1 = 1.5 * ax**3 - 2.5 * ax**2 + 1.0
    w2 = -0.5 * ax**3 + 2.5 * ax**2 - 4.0 * ax + 2.0
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _shear_matrix(n: int, t, axis_len: int):
    """W[r, i, j] = kernel(i + t*(r - c_r) - j): per-row (r along the OTHER
    axis) 1-D resampling matrix for a shear of slope t. Rows whose sample
    position falls outside [0, n-1] get (near-)zero weights (content lost
    at the pad boundary — callers pad so real content never reaches it)."""
    r = jnp.arange(axis_len, dtype=jnp.float32) - (axis_len - 1) / 2.0
    i = jnp.arange(n, dtype=jnp.float32)
    pos = i[None, :] + t * r[:, None]  # [r, i] sample position
    return _catmull_rom(pos[:, :, None] - i[None, None, :])  # [r, i, j]


def _shear_x(vol, t):
    """out[x, y, z] = vol(x + t*(y - cy), y, z) by batched matmul."""
    n, ny = vol.shape[0], vol.shape[1]
    w = _shear_matrix(n, t, ny)  # [y, i, j]
    return jnp.einsum("yij,jyz->iyz", w, vol, preferred_element_type=jnp.float32)


def _shear_x_t(volbar, t):
    n, ny = volbar.shape[0], volbar.shape[1]
    w = _shear_matrix(n, t, ny)
    return jnp.einsum("yij,iyz->jyz", w, volbar, preferred_element_type=jnp.float32)


def _shear_y(vol, t):
    """out[x, y, z] = vol(x, y + t*(x - cx), z)."""
    nx, n = vol.shape[0], vol.shape[1]
    w = _shear_matrix(n, t, nx)  # [x, i, j]
    return jnp.einsum("xij,xjz->xiz", w, vol, preferred_element_type=jnp.float32)


def _shear_y_t(volbar, t):
    nx, n = volbar.shape[0], volbar.shape[1]
    w = _shear_matrix(n, t, nx)
    return jnp.einsum("xij,xiz->xjz", w, volbar, preferred_element_type=jnp.float32)


def _rotate_small(vol, theta):
    """vol(R(theta) p) for |theta| <= ~45 deg via 3 shears (exact rotation
    of the continuum operator; 3 linear resamplings discretely)."""
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    return _shear_x(_shear_y(_shear_x(vol, a), b), a)


def _rotate_small_t(volbar, theta):
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    return _shear_x_t(_shear_y_t(_shear_x_t(volbar, a), b), a)


def _quarter_turn(vol, k: int):
    """vol(R(90 deg * k) p) on a centred square xy grid: exact index
    permutation. R(90): (x, y) -> (-y, x), i.e. out[i, j] = in at
    (x=-y_j, y=x_i) -> in[flip(j), i]."""
    k = k % 4
    for _ in range(k):
        vol = jnp.flip(jnp.swapaxes(vol, 0, 1), axis=1)
    return vol


def _quarter_turn_t(vol, k: int):
    """Transpose of _quarter_turn (= inverse: permutations are orthogonal)."""
    k = k % 4
    for _ in range(k):
        vol = jnp.swapaxes(jnp.flip(vol, axis=1), 0, 1)
    return vol


@dataclasses.dataclass(frozen=True)
class ShearWarpSpec:
    """Static geometry of one projector instance."""

    vol_shape: tuple  # original (nx, ny, nz)
    n_pad: int  # padded square xy size
    nz: int
    spacing_xy: float
    spacing_z: float
    origin_z: float  # mm of z voxel 0
    sad: float
    sdd: float
    pixel_u: tuple  # detector u coordinates (mm, principal-point-relative)
    pixel_v: tuple

    @staticmethod
    def build(vol_shape, vol_spacing, vol_origin, geometry: ConeBeamGeometry,
              pad_factor: float = 1.5) -> "ShearWarpSpec":
        nx, ny, nz = (int(s) for s in vol_shape)
        sp = np.asarray(vol_spacing, np.float64)
        if abs(sp[0] - sp[1]) > 1e-9:
            raise ValueError("shear-warp needs dx == dy")
        org = np.asarray(vol_origin, np.float64)
        for ax in range(2):
            c = org[ax] + (vol_shape[ax] - 1) * sp[ax] / 2.0
            if abs(c) > 0.51 * sp[ax]:
                raise ValueError(
                    "shear-warp needs the xy grid centred on the rotation "
                    f"axis (axis {ax} centre {c:.2f} mm)"
                )
        # pad to a square that keeps every voxel inside the grid through
        # the worst-case shear intermediates (<= sqrt(2) excursion for
        # |theta| <= 45 deg)
        n = max(nx, ny)
        n_pad = int(np.ceil(n * pad_factor / 8.0) * 8)
        return ShearWarpSpec(
            vol_shape=(nx, ny, nz), n_pad=n_pad, nz=nz,
            spacing_xy=float(sp[0]), spacing_z=float(sp[2]),
            origin_z=float(org[2]), sad=float(geometry.sad),
            sdd=float(geometry.sdd),
            pixel_u=tuple(float(x) for x in geometry.u_coordinates()),
            pixel_v=tuple(float(x) for x in geometry.v_coordinates()),
        )


def _pad_volume(spec: ShearWarpSpec, vol):
    nx, ny, _ = spec.vol_shape
    n = spec.n_pad
    ox = (n - nx) // 2
    oy = (n - ny) // 2
    return jnp.zeros((n, n, spec.nz), vol.dtype).at[
        ox : ox + nx, oy : oy + ny
    ].set(vol)


def _crop_volume(spec: ShearWarpSpec, vol):
    nx, ny, _ = spec.vol_shape
    n = spec.n_pad
    ox = (n - nx) // 2
    oy = (n - ny) // 2
    return vol[ox : ox + nx, oy : oy + ny]


def _plane_matrices(spec: ShearWarpSpec):
    """Per-depth-plane separable resampling matrices.

    Bx[y, x, u] = hat weight of padded-volume x-index x for the sample at
    u_coord * m(y); Bz[y, z, v] likewise along z. Magnification
    m(y) = (y + SAD)/SDD with y the plane's mm coordinate. Includes the
    path element dy * L/SDD folded into Bx (per-u part) and the plane sum.
    """
    n, nz = spec.n_pad, spec.nz
    d = spec.spacing_xy
    cy = (n - 1) / 2.0
    y_mm = (jnp.arange(n, dtype=jnp.float32) - cy) * d
    m = (y_mm + spec.sad) / spec.sdd  # [ny]

    u = jnp.asarray(spec.pixel_u, jnp.float32)  # [nu]
    v = jnp.asarray(spec.pixel_v, jnp.float32)  # [nv]

    x_idx = u[None, :] * m[:, None] / d + cy  # [ny, nu] volume x index
    xi = jnp.arange(n, dtype=jnp.float32)
    bx = _hat(x_idx[:, None, :] - xi[None, :, None])  # [ny, nx, nu]

    z_idx = (v[None, :] * m[:, None] - spec.origin_z) / spec.spacing_z
    zi = jnp.arange(nz, dtype=jnp.float32)
    bz = _hat(z_idx[:, None, :] - zi[None, :, None])  # [ny, nz, nv]
    return bx, bz


def _ray_weight(spec: ShearWarpSpec):
    u = jnp.asarray(spec.pixel_u, jnp.float32)
    v = jnp.asarray(spec.pixel_v, jnp.float32)
    L = jnp.sqrt(spec.sdd**2 + u[None, :] ** 2 + v[:, None] ** 2)
    return spec.spacing_xy * L / spec.sdd  # [nv, nu]


def _theta_quarter(angles_deg):
    """Split alpha - 270 into k * 90 deg + theta with |theta| <= 45 deg."""
    delta = np.asarray(angles_deg, np.float64) - 270.0
    k = np.rint(delta / 90.0).astype(int)
    theta = np.deg2rad(delta - 90.0 * k)
    return k % 4, theta.astype(np.float32)


@partial(jax.jit, static_argnames=("spec", "k90"))
def _sw_project_group(spec: ShearWarpSpec, k90: int, vol_padded, thetas):
    """Line integrals for a group of views sharing one quarter-turn.
    vol_padded: [n, n, nz] (already padded); thetas: [g]. -> [g, nv, nu]."""
    vq = _quarter_turn(vol_padded, k90)
    bx, bz = _plane_matrices(spec)
    w = _ray_weight(spec)

    def one(theta):
        vr = _rotate_small(vq, theta)
        t1 = jnp.einsum("yxu,xyz->yuz", bx, vr,
                        preferred_element_type=jnp.float32)
        p = jnp.einsum("yuz,yzv->vu", t1, bz,
                       preferred_element_type=jnp.float32)
        return p * w

    return jax.vmap(one)(thetas)


@partial(jax.jit, static_argnames=("spec", "k90"))
def _sw_backproject_group(spec: ShearWarpSpec, k90: int, g, thetas):
    """EXACT transpose of _sw_project_group w.r.t. the volume.
    g: [g, nv, nu] -> [n, n, nz] padded volume cotangent (summed over the
    group)."""
    bx, bz = _plane_matrices(spec)
    w = _ray_weight(spec)

    def one(gi, theta):
        g2 = gi * w
        t1 = jnp.einsum("yzv,vu->yuz", bz, g2,
                        preferred_element_type=jnp.float32)
        vr = jnp.einsum("yxu,yuz->xyz", bx, t1,
                        preferred_element_type=jnp.float32)
        return _rotate_small_t(vr, theta)

    vq_bar = jax.vmap(one)(g, thetas).sum(axis=0)
    return _quarter_turn_t(vq_bar, k90)


class ShearWarpProjector:
    """Matched forward/adjoint cone-beam projector over a fixed view set.

    ``forward(volume) -> [P, nv, nu]`` and ``transpose(projections) ->
    volume`` are exact transposes of each other (validated by the
    <Ax, y> = <x, A^T y> identity in tests/test_shearwarp.py), so ROOSTER's
    CG on the normal equations converges properly. Views are grouped by
    quarter-turn (4 compiled programs) and batched ``views_per_call`` at a
    time; every device program is dense MXU work with bounded size, so the
    giant-gather kernel faults of the ray-marched path cannot occur.
    """

    def __init__(
        self,
        vol_shape,
        vol_origin,
        vol_spacing,
        geometry: ConeBeamGeometry,
        angles_deg: Sequence[float],
        views_per_call: int = 16,
    ):
        self.spec = ShearWarpSpec.build(
            vol_shape, vol_spacing, vol_origin, geometry
        )
        self.n_views = len(angles_deg)
        k90, theta = _theta_quarter(angles_deg)
        self.views_per_call = int(views_per_call)
        # stable partition: per quarter-turn bucket, chunks of views. Ragged
        # chunks are padded to views_per_call with theta=0 dummies so only
        # ONE program shape compiles per quarter-turn (n_valid masks them)
        self._calls = []  # (k90, view_indices[n_valid], thetas[chunk])
        for k in range(4):
            idx = np.where(k90 == k)[0]
            for lo in range(0, len(idx), self.views_per_call):
                sel = idx[lo : lo + self.views_per_call]
                th = np.zeros(self.views_per_call, np.float32)
                th[: len(sel)] = theta[sel]
                self._calls.append((k, sel, jnp.asarray(th)))

    def forward(self, volume) -> jnp.ndarray:
        """A @ volume: [P, nv, nu] line integrals (unit * mm)."""
        spec = self.spec
        vol_padded = _pad_volume(spec, jnp.asarray(volume, jnp.float32))
        nu, nv = len(spec.pixel_u), len(spec.pixel_v)
        out = jnp.zeros((self.n_views, nv, nu), jnp.float32)
        for k, sel, thetas in self._calls:
            p = _sw_project_group(spec, k, vol_padded, thetas)
            out = out.at[jnp.asarray(sel)].set(p[: len(sel)])
        return out

    def transpose(self, projections) -> jnp.ndarray:
        """A^T @ projections: exact adjoint of :meth:`forward`."""
        spec = self.spec
        projections = jnp.asarray(projections, jnp.float32)
        nu, nv = len(spec.pixel_u), len(spec.pixel_v)
        acc = jnp.zeros((spec.n_pad, spec.n_pad, spec.nz), jnp.float32)
        for k, sel, thetas in self._calls:
            g = jnp.zeros((self.views_per_call, nv, nu), jnp.float32)
            g = g.at[: len(sel)].set(projections[jnp.asarray(sel)])
            acc = acc + _sw_backproject_group(spec, k, g, thetas)
        return _crop_volume(spec, acc)


def shearwarp_project(
    volume: np.ndarray,
    geometry: ConeBeamGeometry,
    angles_deg: Sequence[float],
    volume_spacing=(1.0, 1.0, 1.0),
    volume_origin=None,
) -> np.ndarray:
    """Drop-in functional forward projection (API parallel to
    joseph.project_forward) using the shear-warp MXU path."""
    volume = np.asarray(volume, np.float32)
    spacing = np.asarray(volume_spacing, np.float64)
    if volume_origin is None:
        volume_origin = -(np.asarray(volume.shape) - 1) * spacing / 2
    proj = ShearWarpProjector(
        volume.shape, volume_origin, spacing, geometry, angles_deg
    )
    return np.asarray(proj.forward(volume))
