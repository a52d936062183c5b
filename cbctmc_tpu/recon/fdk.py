"""FDK cone-beam reconstruction in JAX.

Replaces the reference's Docker-shipped ``rtkfdk`` app (reference invocation:
cbctmc/reconstruction/reconstruction.py:22-69 with pad=1, hann=1, hannY=1,
short-scan 360, water-precorrection polynomial, (464,250,464) @ 1 mm).

Pipeline per projection stack g[P, nv, nu] of line integrals:

1. optional water-precorrection polynomial sum_k c_k g^k
   (reference WPC coefficients: cbctmc/defaults.py:13-20),
2. displaced-detector (half-fan) weighting — the smooth 0..2 transition of
   Wang(2002) over the conjugate-overlap region, as RTK's
   DisplacedDetectorImageFilter applies for the laterally shifted panel,
3. cosine pre-weighting sdd / sqrt(sdd^2 + u^2 + v^2),
4. row-wise ramp filtering via real FFT with zero padding and a Hann window
   (optional Hann low-pass along v = RTK's hannY),
5. voxel-driven backprojection with the (sad/U)^2 distance weight, summed
   over projections with angular weight arc/(2*n_proj).

The absolute scale reproduces mu in the projections' inverse length unit
(validated against analytic cylinders in tests/test_fdk.py).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid


def apply_water_precorrection(
    projections: jnp.ndarray, coefficients: Sequence[float]
) -> jnp.ndarray:
    """p' = sum_k c_k * p^k (order 0..len-1)."""
    out = jnp.zeros_like(projections)
    power = jnp.ones_like(projections)
    for c in coefficients:
        out = out + c * power
        power = power * projections
    return out


def ramp_kernel_fourier(n_fft: int, du: float, hann: float) -> np.ndarray:
    """Band-limited ramp (Ram-Lak) transfer function with Hann apodisation.

    Built from the exact spatial-domain kernel (h[0] = 1/(4 du^2),
    h[odd] = -1/(pi n du)^2) so the DC response is correct, then windowed by
    0.5*(1 + cos(pi f / (hann * f_nyquist))) for |f| <= hann * f_nyquist.
    """
    n = np.arange(-(n_fft // 2), n_fft // 2)
    h = np.zeros(n_fft)
    h[n_fft // 2] = 1.0 / (4.0 * du * du)
    odd = (np.abs(n) % 2) == 1
    h[odd] = -1.0 / (np.pi * n[odd] * du) ** 2
    H = np.abs(np.fft.rfft(np.fft.ifftshift(h)))

    if hann and hann > 0:
        freqs = np.fft.rfftfreq(n_fft, d=du)
        f_cut = hann * 0.5 / du
        window = 0.5 * (1.0 + np.cos(np.pi * freqs / f_cut))
        window[freqs > f_cut] = 0.0
        H = H * window
    return H.astype(np.float32)


def lowpass_kernel_fourier(n_fft: int, dv: float, hann_y: float) -> np.ndarray:
    """Hann low-pass transfer function (RTK's hannY vertical filter)."""
    freqs = np.fft.rfftfreq(n_fft, d=dv)
    f_cut = hann_y * 0.5 / dv
    window = 0.5 * (1.0 + np.cos(np.pi * freqs / f_cut))
    window[freqs > f_cut] = 0.0
    return window.astype(np.float32)


def displaced_detector_weights(geometry: ConeBeamGeometry) -> np.ndarray:
    """Wang-2002 weights for a laterally displaced detector on a full scan:
    0 beyond the unmeasured conjugate edge, smooth sin^2 ramp 0->2 across the
    conjugate-overlap region, 2 on the far side. Returns [nu] (identity if
    the detector is centred)."""
    u = geometry.u_coordinates()
    u_min, u_max = u.min(), u.max()
    if abs(geometry.detector_offset_u) < 1e-9:
        return np.ones_like(u, dtype=np.float32)
    overlap = min(abs(u_min), abs(u_max))
    w = np.ones_like(u)
    if u_max > -u_min:  # detector extends to +u; conjugate overlap |u|<=ov
        ramp = np.sin(np.pi / 4.0 * (u / overlap + 1.0)) ** 2
        w = np.where(u < -overlap, 0.0, np.where(u > overlap, 1.0, ramp)) * 2.0
    else:
        ramp = np.sin(np.pi / 4.0 * (1.0 - u / overlap)) ** 2
        w = np.where(u > overlap, 0.0, np.where(u < -overlap, 1.0, ramp)) * 2.0
    return w.astype(np.float32)


def filter_projections(
    projections: np.ndarray | jnp.ndarray,
    geometry: ConeBeamGeometry,
    pad: float = 1.0,
    hann: float = 1.0,
    hann_y: float = 1.0,
    water_precorrection: Sequence[float] | None = None,
) -> jnp.ndarray:
    """Weight + ramp-filter a projection stack [P, nv, nu]."""
    g = jnp.asarray(projections, jnp.float32)
    p_count, nv, nu = g.shape

    if water_precorrection is not None:
        g = apply_water_precorrection(g, water_precorrection)

    u = geometry.u_coordinates().astype(np.float32)
    v = geometry.v_coordinates().astype(np.float32)
    cosine = geometry.sdd / np.sqrt(
        geometry.sdd**2 + u[None, :] ** 2 + v[:, None] ** 2
    )
    weights = cosine * displaced_detector_weights(geometry)[None, :]
    g = g * jnp.asarray(weights, jnp.float32)[None]

    # ramp filter along u (on the virtual isocenter detector: spacing scaled
    # by sad/sdd; equivalently scale the result, since ramp(a*du) = ramp/a)
    du = geometry.pixel_size_u * geometry.sad / geometry.sdd
    n_fft = int(2 ** np.ceil(np.log2(nu * (1.0 + max(pad, 0.0)))))
    H = jnp.asarray(ramp_kernel_fourier(n_fft, du, hann))
    spec = jnp.fft.rfft(g, n=n_fft, axis=-1)
    g = jnp.fft.irfft(spec * H[None, None, :], n=n_fft, axis=-1)[..., :nu]
    g = g * du  # quadrature of the convolution integral

    if hann_y and hann_y > 0 and nv > 1:
        dv = geometry.pixel_size_v
        n_fft_v = int(2 ** np.ceil(np.log2(nv * 2)))
        Hv = jnp.asarray(lowpass_kernel_fourier(n_fft_v, dv, hann_y))
        spec_v = jnp.fft.rfft(g, n=n_fft_v, axis=-2)
        g = jnp.fft.irfft(spec_v * Hv[None, :, None], n=n_fft_v, axis=-2)[
            ..., :nv, :
        ]
    return g


@partial(jax.jit, static_argnames=("vol_shape",), donate_argnums=(12,))
def _backproject_into(
    filtered,  # [P, nv, nu]
    sources,  # [P, 3]
    dirs,  # [P, 3]
    e_us,  # [P, 3]
    u0_inv_du,  # [2] (u_origin, 1/du) for pixel index = (u - u0)/du
    v0_inv_dv,
    vol_shape: tuple,
    vol_origin,
    vol_spacing,
    sad,
    sdd,
    angular_weight,
    # accumulate into an existing volume (donated) so the host can stream
    # view chunks through one compiled program: a single program covering
    # all views of a production scan (894) reproducibly crashes the TPU
    # worker (round-4 acceptance, runs/r4queue3/acceptance.log), while the
    # 120-view round-3 run survived — program run length is the variable
    vol_in=None,
):
    nxv, nyv, nzv = vol_shape
    xs = vol_origin[0] + vol_spacing[0] * jnp.arange(nxv, dtype=jnp.float32)
    ys = vol_origin[1] + vol_spacing[1] * jnp.arange(nyv, dtype=jnp.float32)
    zs = vol_origin[2] + vol_spacing[2] * jnp.arange(nzv, dtype=jnp.float32)
    X = xs[:, None, None]
    Y = ys[None, :, None]
    Z = zs[None, None, :]

    nv, nu = filtered.shape[1:]

    def body(i, vol):
        g = filtered[i]
        s = sources[i]
        d = dirs[i]
        eu = e_us[i]

        rx = X - s[0]
        ry = Y - s[1]
        rz = Z - s[2]
        depth = rx * d[0] + ry * d[1]  # d[2] = 0
        depth = jnp.maximum(depth, 1e-3)
        scale = sdd / depth
        u = (rx * eu[0] + ry * eu[1]) * scale
        v = rz * scale

        pu = (u - u0_inv_du[0]) * u0_inv_du[1]
        pv = (v - v0_inv_dv[0]) * v0_inv_dv[1]
        inside = (pu >= 0.0) & (pu <= nu - 1.0) & (pv >= 0.0) & (pv <= nv - 1.0)
        pu = jnp.clip(pu, 0.0, nu - 1.0)
        pv = jnp.clip(pv, 0.0, nv - 1.0)
        u0 = jnp.clip(pu.astype(jnp.int32), 0, nu - 2)
        v0 = jnp.clip(pv.astype(jnp.int32), 0, nv - 2)
        fu = pu - u0
        fv = pv - v0

        flat = g.reshape(-1)
        base = v0 * nu + u0
        g00 = flat[base]
        g01 = flat[base + 1]
        g10 = flat[base + nu]
        g11 = flat[base + nu + 1]
        sample = (
            g00 * (1 - fu) * (1 - fv)
            + g01 * fu * (1 - fv)
            + g10 * (1 - fu) * fv
            + g11 * fu * fv
        )
        w = (sad / depth) ** 2
        return vol + jnp.where(inside, sample * w, 0.0)

    vol = jax.lax.fori_loop(
        0, filtered.shape[0], body, jnp.zeros(vol_shape, jnp.float32)
    )
    return vol_in + vol * angular_weight


def _backproject(
    filtered, sources, dirs, e_us, u0_inv_du, v0_inv_dv, vol_shape: tuple,
    vol_origin, vol_spacing, sad, sdd, angular_weight,
):
    """One-shot backprojection (ROOSTER's Landweber fallback and tests).
    Prefer the streaming loop in fdk_reconstruct for production view counts."""
    return _backproject_into(
        filtered, sources, dirs, e_us, u0_inv_du, v0_inv_dv, vol_shape,
        vol_origin, vol_spacing, sad, sdd, angular_weight,
        vol_in=jnp.zeros(vol_shape, jnp.float32),
    )


def fdk_reconstruct(
    projections: np.ndarray,
    geometry: ConeBeamGeometry,
    angles_deg: Sequence[float],
    grid: VolumeGrid | None = None,
    pad: float = 1.0,
    hann: float = 1.0,
    hann_y: float = 1.0,
    water_precorrection: Sequence[float] | None = None,
    arc_deg: float = 360.0,
    view_chunk: int = 64,
) -> np.ndarray:
    """Full FDK reconstruction. Returns the volume [x, y, z] (z = rotation
    axis) in the projections' inverse-length unit per mm.

    The view loop is STREAMED from the host in ``view_chunk``-sized device
    programs (filter + backprojection per chunk, one compiled program reused
    across chunks, a cheap readback after each to bound the async queue).
    One monolithic program over a production scan (894 views, the
    reference's defaults.py:25) reproducibly crashed the TPU worker in
    round 4 (runs/r4queue3/acceptance.log) while chunk-scale programs
    survive; streaming also bounds filter memory (a full-resolution stack's
    rfft intermediate alone exceeds a v5e's 16 GB HBM)."""
    grid = grid or VolumeGrid()
    projections = np.asarray(projections, np.float32)
    n_views = projections.shape[0]
    view_chunk = max(1, min(view_chunk, n_views))

    angles = np.asarray(angles_deg, np.float64)
    sources = geometry.source_positions(angles).astype(np.float32)
    dirs = geometry.beam_directions(angles).astype(np.float32)
    e_us = geometry.u_axes(angles).astype(np.float32)

    u = geometry.u_coordinates()
    v = geometry.v_coordinates()
    angular_weight = np.deg2rad(arc_deg) / (2.0 * len(angles))

    u0_inv_du = jnp.asarray([u[0], 1.0 / geometry.pixel_size_u], jnp.float32)
    v0_inv_dv = jnp.asarray([v[0], 1.0 / geometry.pixel_size_v], jnp.float32)
    vol_origin = jnp.asarray(grid.origin_or_centered(), jnp.float32)
    vol_spacing = jnp.asarray(grid.spacing, jnp.float32)

    vol = jnp.zeros(tuple(grid.shape), jnp.float32)
    for start in range(0, n_views, view_chunk):
        stop = min(start + view_chunk, n_views)
        # zero-pad the last chunk to the compiled chunk shape: zero
        # projections filter and backproject to zero, so replicated
        # geometry rows contribute nothing
        chunk = np.zeros(
            (view_chunk, *projections.shape[1:]), np.float32
        )
        chunk[: stop - start] = projections[start:stop]
        src = np.repeat(sources[stop - 1 : stop], view_chunk, axis=0)
        dr = np.repeat(dirs[stop - 1 : stop], view_chunk, axis=0)
        eu = np.repeat(e_us[stop - 1 : stop], view_chunk, axis=0)
        src[: stop - start] = sources[start:stop]
        dr[: stop - start] = dirs[start:stop]
        eu[: stop - start] = e_us[start:stop]

        filtered = filter_projections(
            chunk, geometry, pad=pad, hann=hann, hann_y=hann_y,
            water_precorrection=water_precorrection,
        )
        if stop - start < view_chunk:
            # padded views are not zero after filtering when the WPC
            # polynomial has a constant term — mask them out explicitly
            filtered = filtered.at[stop - start :].set(0.0)
        vol = _backproject_into(
            filtered,
            jnp.asarray(src),
            jnp.asarray(dr),
            jnp.asarray(eu),
            u0_inv_du,
            v0_inv_dv,
            tuple(grid.shape),
            vol_origin,
            vol_spacing,
            jnp.float32(geometry.sad),
            jnp.float32(geometry.sdd),
            jnp.float32(angular_weight),
            vol_in=vol,
        )
        # sync: bound the in-flight program queue and surface a worker
        # fault at the chunk that caused it (block_until_ready does not
        # sync on this platform — docs/ROOFLINE.md)
        np.asarray(vol[0, 0, 0])
    return np.asarray(vol)
