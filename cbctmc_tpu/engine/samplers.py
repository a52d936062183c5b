"""Vectorized interaction samplers.

The reference engine's per-thread rejection loops (PENELOPE-2006 GCOa
Compton sampling with Doppler-broadened analytic shell profiles, RITA
Rayleigh form-factor sampling, PENMAIN square-field fan-beam source;
reference: docker/mcgpu/MC-GPU_kernel_v1.3.cu:626-686, 1181-1246,
1287-1515) are recast here as fixed-trip masked iterations over the whole
photon batch: every trip proposes for all not-yet-accepted lanes and commits
accepted proposals.

Trip counts are sized so the probability of exhausting them is below 1e-5
per lane (measured in tests/test_samplers.py): the Compton tau rejection
accepts with probability >~ 0.6 (worst measured case: low-energy, high-Z
materials), so 16 trips bound exhaustion below 1e-6; the Rayleigh Thomson
rejection accepts with >~ 2/3. Exhausted
lanes commit their last proposal - a bias far below Monte-Carlo noise at
any practical history count.

Each sampler comes in two forms: a ``*_rows`` core that takes pre-fetched
per-lane table rows (the transport engine fetches them with one MXU one-hot
matmul / one wide row-gather per batch - gathers on TPU cost per *index*,
so the per-trip table walks of the reference would dominate the device
time), and a convenience wrapper with the per-lane (mat, ebin) signature
that gathers the rows itself (used by tests and external callers).

All samplers are shape-polymorphic over the lane axis and pure; masked-out
lanes pass their inputs through unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cbctmc_tpu.engine.rng import uniform_open, uniforms_open
from cbctmc_tpu.engine.tables import DeviceTables
from cbctmc_tpu.physics.constants import (
    INV_ELECTRON_REST_ENERGY,
    ELECTRON_REST_ENERGY_EV,
    NP_RAYLEIGH,
    RAYLEIGH_X_FACTOR,
    TWO_PI,
)

_SQRT_HALF = 0.70710678118654502
_SQRT_TWO = 1.4142135623731

# fixed trip counts for the masked rejection iterations (see module docs)
SOURCE_DIR_TRIPS = 2
COMPTON_TAU_TRIPS = 16
COMPTON_SHELL_TRIPS = 8
RAYLEIGH_TRIPS = 12


def _profile_cdf_complement_terms(pzomc: jnp.ndarray) -> jnp.ndarray:
    """The analytic one-electron Compton profile integral
    n(pz) = 1 - 0.5*exp(0.5 - (1/sqrt2 + sqrt2*pz)^2)  for pz > 0
          =     0.5*exp(0.5 - (1/sqrt2 - sqrt2*pz)^2)  for pz <= 0
    (PENELOPE 2006 eq. 2.54-2.58)."""
    t = jnp.where(
        pzomc > 0.0,
        (_SQRT_HALF + pzomc * _SQRT_TWO) ** 2,
        (_SQRT_HALF - pzomc * _SQRT_TWO) ** 2,
    )
    val = 0.5 * jnp.exp(jnp.minimum(0.5 - t, 0.0))
    return jnp.where(pzomc > 0.0, 1.0 - val, val)


def _shell_pzomc(
    energy: jnp.ndarray, ui: jnp.ndarray, j0: jnp.ndarray, cdt1: jnp.ndarray
) -> jnp.ndarray:
    """Maximum projected electron momentum (units of m_e*c) transferable to a
    shell with ionisation energy ui at scattering 1-cos(theta) = cdt1."""
    aux = energy * (energy - ui) * cdt1
    safe = (aux > 1.0e-12) | (ui > 1.0e-12)
    denom = jax.lax.rsqrt(jnp.maximum(aux + aux + ui * ui, 1.0e-30))
    pz = j0 * (aux - ui * ELECTRON_REST_ENERGY_EV) * denom * INV_ELECTRON_REST_ENERGY
    # rough fallback used by the reference for the degenerate aux=ui=0 case
    return jnp.where(safe, pz, 0.002)


def compton_scatter_rows(
    key: jax.Array,
    energy: jnp.ndarray,
    s0: jnp.ndarray,
    f_rows: jnp.ndarray,
    ui_rows: jnp.ndarray,
    j0_rows: jnp.ndarray,
    mask: jnp.ndarray,
    return_accepted: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Sample Compton scattering from pre-fetched per-lane shell rows:
    returns (new_energy, cos_theta) (plus the tau-acceptance mask when
    ``return_accepted`` - for the trip-exhaustion statistics tests).

    Implements the PENELOPE-2006 relativistic impulse approximation: tau is
    sampled from the Klein-Nishina composition scheme and accepted against
    the ratio of incoherent scattering functions S(E,theta)/S(E,pi), then a
    target shell and Doppler-broadened projected momentum determine the
    energy loss. ``s0`` is S(E,pi) (precomputed per energy bin/material);
    ``f/ui/j0_rows`` are SHELL-MAJOR [max_shells, n] - the lane axis sits in
    the TPU lane dimension so the per-shell arithmetic uses full 8x128
    vector tiles and the shell reductions run over sublanes. Closed/padded
    shells carry a huge finite ui (reference math:
    MC-GPU_kernel_v1.3.cu:1287-1515)."""
    n = energy.shape[0]
    s_max = f_rows.shape[0]

    ek = energy * INV_ELECTRON_REST_ENERGY
    ek2 = ek * 2.0 + 1.0
    ek3 = ek * ek
    ek1 = ek3 - ek2 - 1.0
    taumin = 1.0 / ek2
    a1 = jnp.log(ek2)
    a2 = a1 + 2.0 * ek * (ek + 1.0) * taumin * taumin

    open_shell = ui_rows < energy[None, :]
    f_open = jnp.where(open_shell, f_rows, 0.0)
    # padded/closed shells: keep the arithmetic finite (their contribution
    # is masked out anyway)
    ui = jnp.where(open_shell, ui_rows, 0.0)
    j0 = j0_rows

    # --- masked rejection sampling of tau ------------------------------
    # ALL trip uniforms come from one RngBitGenerator call and only [n]
    # vectors are carried between trips (tau, cdt1, accepted); the [s_max,
    # n] profile terms are single-use per trip and recomputed once after
    # the loop. Both choices exist so XLA can fuse the whole unrolled
    # rejection into a handful of kernels that read the [s_max, n] shell
    # rows from HBM once instead of per trip - the shell-row traffic, not
    # the transcendentals, dominated the event stage before
    k_tau, k_shell = jax.random.split(key)
    u_tau = uniform_open(k_tau, (3 * COMPTON_TAU_TRIPS, n))

    tau0 = jnp.ones((n,), jnp.float32)
    tau, cdt1 = tau0, tau0
    accepted = ~mask
    for i in range(COMPTON_TAU_TRIPS):
        u1, u2, u3 = u_tau[3 * i], u_tau[3 * i + 1], u_tau[3 * i + 2]
        tau_prop = jnp.where(
            u1 * a2 < a1,
            jnp.power(taumin, u2),
            jnp.sqrt(1.0 + u2 * (taumin * taumin - 1.0)),
        )
        cdt1_prop = jnp.minimum(
            (1.0 - tau_prop) / (tau_prop * ek), jnp.float32(1.99999999)
        )
        pz = _shell_pzomc(energy[None, :], ui, j0, cdt1_prop[None, :])
        rn_prop = _profile_cdf_complement_terms(pz)
        s_prop = jnp.sum(f_open * rn_prop, axis=0)
        # Klein-Nishina * S ratio rejection
        t_kn = (
            s_prop
            * (1.0 + tau_prop * (ek1 + tau_prop * (ek2 + tau_prop * ek3)))
            / (ek3 * tau_prop * (tau_prop * tau_prop + 1.0))
        )
        accept_now = (u3 * s0 <= t_kn) & ~accepted
        take = accept_now | (~accepted & (i == COMPTON_TAU_TRIPS - 1))
        tau = jnp.where(take, tau_prop, tau)
        cdt1 = jnp.where(take, cdt1_prop, cdt1)
        accepted = accepted | accept_now

    new_energy, costh = _shell_doppler_and_energy(
        k_shell, energy, tau, cdt1, f_open, open_shell, ui, j0, mask
    )
    if return_accepted:
        return new_energy, costh, accepted
    return new_energy, costh


def compton_scatter_rows_tab(
    key: jax.Array,
    energy: jnp.ndarray,
    cdt1: jnp.ndarray,
    f_rows: jnp.ndarray,
    ui_rows: jnp.ndarray,
    j0_rows: jnp.ndarray,
    mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compton sampling with a PRE-SAMPLED scattering angle (engine v3.4b:
    cdt1 drawn from the tabulated inverse CDF of the exact KN x S(E,theta)
    distribution - see tables._tabulate_compton_tau_icdf); only the target
    shell + Doppler-broadened energy-loss stage runs here. The joint
    distribution factorises as marginal(angle) x conditional(shell, pz |
    angle), so swapping the marginal's sampler leaves the conditionals
    untouched."""
    ek = energy * INV_ELECTRON_REST_ENERGY
    tau = 1.0 / (1.0 + ek * cdt1)
    open_shell = ui_rows < energy[None, :]
    f_open = jnp.where(open_shell, f_rows, 0.0)
    ui = jnp.where(open_shell, ui_rows, 0.0)
    return _shell_doppler_and_energy(
        key, energy, tau, cdt1, f_open, open_shell, ui, j0_rows, mask
    )


def sample_icdf_rows_cdt1(
    u2: jnp.ndarray,
    energy: jnp.ndarray,
    row_in_table: jnp.ndarray,
    icdf_table: jnp.ndarray,
    tables: DeviceTables,
) -> jnp.ndarray:
    """Map two uniforms [2, n] to a 1-cos(theta) sample via a tabulated
    inverse CDF on the coarse log-energy grid: stochastic interpolation
    between the two bracketing log-energy rows (PENELOPE-style) + linear
    interpolation at an equal-probability knot.

    ``row_in_table(j_e) -> row index`` lets callers address a concatenated
    Compton|Rayleigh table with ONE gather (transport v4 fetches the angle
    for both event kinds from a single fused table). Callers supply the
    uniforms so the engine's RNG stream is unaffected by where this lives."""
    n_ie = tables.n_icdf_energies
    pos = jnp.clip(
        (jnp.log(energy) - tables.icdf_log_lo)
        * ((n_ie - 1.0) / (tables.icdf_log_hi - tables.icdf_log_lo)),
        0.0,
        n_ie - 1.0,
    )
    j_e = jnp.floor(pos).astype(jnp.int32)
    j_e = jnp.minimum(j_e + (u2[0] < pos - j_e).astype(jnp.int32), n_ie - 1)
    rows = icdf_table[row_in_table(j_e)]  # [n, K]
    k_knots = rows.shape[1]
    sk = u2[1] * (k_knots - 1)
    jk = jnp.floor(sk).astype(jnp.int32)
    fk = sk - jk
    iota_k = jnp.arange(k_knots, dtype=jnp.int32)[None, :]
    # one-hot selects (take_along_axis lowers to per-index gathers)
    v0 = jnp.sum(jnp.where(iota_k == jk[:, None], rows, 0.0), axis=1)
    v1 = jnp.sum(
        jnp.where(
            iota_k == jnp.minimum(jk + 1, k_knots - 1)[:, None], rows, 0.0
        ),
        axis=1,
    )
    return v0 * (1.0 - fk) + v1 * fk


def sample_compton_cdt1_tab(
    u2: jnp.ndarray,
    energy: jnp.ndarray,
    mat: jnp.ndarray,
    tables: DeviceTables,
) -> jnp.ndarray:
    """Compton 1-cos(theta) from the tabulated inverse CDF (engine v3.4b
    path and the chi-square A/B tests)."""
    return sample_icdf_rows_cdt1(
        u2, energy, lambda j_e: j_e * tables.n_mats + mat,
        tables.compton_icdf, tables,
    )


def sample_rayleigh_cdt1_tab(
    u2: jnp.ndarray,
    energy: jnp.ndarray,
    mat: jnp.ndarray,
    tables: DeviceTables,
) -> jnp.ndarray:
    """Rayleigh 1-cos(theta) from the tabulated inverse CDF (engine v4;
    replaces the RITA + Thomson rejection on the hot path)."""
    return sample_icdf_rows_cdt1(
        u2, energy, lambda j_e: j_e * tables.n_mats + mat,
        tables.rayleigh_icdf, tables,
    )


def _shell_doppler_and_energy(
    k_shell, energy, tau, cdt1, f_open, open_shell, ui, j0, mask
):
    """Target-shell selection + Doppler-broadened momentum + scattered
    energy (the second half of GCOa; reference kernel :1408-1515)."""
    n = energy.shape[0]
    s_max = f_open.shape[0]
    costh = 1.0 - cdt1

    # --- target shell + Doppler-broadened momentum ---------------------
    # recompute the profile terms once at the accepted angle (identical
    # math to the taken trip's values)
    pz_final = _shell_pzomc(energy[None, :], ui, j0, cdt1[None, :])
    rn = _profile_cdf_complement_terms(pz_final)
    rn_weighted = jnp.where(open_shell, f_open * rn, 0.0)
    s = jnp.sum(rn_weighted, axis=0)
    cum = jnp.cumsum(rn_weighted, axis=0)
    last_open = jnp.maximum(jnp.sum(open_shell.astype(jnp.int32), axis=0) - 1, 0)
    shell_iota = jnp.arange(s_max, dtype=jnp.int32)[:, None]

    u_shell = uniform_open(k_shell, (3 * COMPTON_SHELL_TRIPS, n))

    def shell_trip(i, carry, u1, u2, u3):
        pzomc, ishell, accepted = carry
        target = (s * u1)[None, :]
        # first open shell whose cumulative f*rn exceeds target; default last
        # (single min-reduce: argmax + any lower to costly sublane passes)
        hit = (cum > target) & open_shell
        idx = jnp.min(jnp.where(hit, shell_iota, s_max), axis=0)
        idx = jnp.where(idx < s_max, idx, last_open)

        # one-hot select (take_along_axis lowers to a per-lane gather, which
        # costs per *index* on TPU; the 40-wide select is free VPU work)
        oh = idx[None, :] == shell_iota
        rn_i = jnp.sum(jnp.where(oh, rn, 0.0), axis=0)
        j0_i = jnp.sum(jnp.where(oh, j0, 0.0), axis=0)
        t = jnp.clip(u2 * rn_i, 1e-12, 1.0 - 1e-7)
        pz_prop = jnp.where(
            t < 0.5,
            (_SQRT_HALF - jnp.sqrt(0.5 - jnp.log(t + t))) / (j0_i * _SQRT_TWO),
            (jnp.sqrt(0.5 - jnp.log(2.0 - 2.0 * t)) - _SQRT_HALF) / (j0_i * _SQRT_TWO),
        )
        physical = pz_prop >= -1.0

        # F(E') rejection
        xqc = 1.0 + tau * (tau - 2.0 * costh)
        af = jnp.where(
            xqc > 1.0e-20,
            jnp.sqrt(jnp.maximum(xqc, 1e-30)) * (tau * (tau - costh) / jnp.maximum(xqc, 1e-30) + 1.0),
            0.002,
        )
        fpzmax = jnp.where(af > 0.0, 1.0 + af * 0.2, 1.0 - af * 0.2)
        fpz = 1.0 + af * jnp.clip(pz_prop, -0.2, 0.2)
        accept_now = physical & (u3 * fpzmax <= fpz) & ~accepted

        take = accept_now | (~accepted & physical & (i == COMPTON_SHELL_TRIPS - 1))
        pzomc = jnp.where(take, pz_prop, pzomc)
        ishell = jnp.where(take, idx, ishell)
        return pzomc, ishell, accepted | accept_now

    carry = (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.int32), ~mask)
    for i in range(COMPTON_SHELL_TRIPS):
        carry = shell_trip(
            i, carry, u_shell[3 * i], u_shell[3 * i + 1], u_shell[3 * i + 2]
        )
    pzomc, _, _ = carry

    # --- scattered photon energy ---------------------------------------
    t = pzomc * pzomc
    b1 = 1.0 - t * tau * tau
    b2 = 1.0 - t * tau * costh
    root = jnp.sqrt(jnp.abs(b2 * b2 - b1 * (1.0 - t)))
    root = jnp.where(pzomc < 0.0, -root, root)
    factor = jnp.minimum((tau / b1) * (b2 + root), 1.0)
    new_energy = energy * factor

    new_energy = jnp.where(mask, new_energy, energy)
    costh = jnp.where(mask, costh, 1.0)
    return new_energy, costh


def compton_scatter(
    key: jax.Array,
    energy: jnp.ndarray,
    mat: jnp.ndarray,
    ebin: jnp.ndarray,
    tables: DeviceTables,
    mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper over :func:`compton_scatter_rows` that fetches
    the per-lane shell rows (shell-major) and S(E,pi) from the tables."""
    s0 = tables.compton_s0[jnp.maximum(ebin, 0) * tables.n_mats + mat]
    f_rows = tables.shell_f[mat].T
    ui_rows = tables.shell_ui[mat].T
    j0_rows = tables.shell_j0[mat].T
    return compton_scatter_rows(key, energy, s0, f_rows, ui_rows, j0_rows, mask)


def rayleigh_scatter_rows(
    key: jax.Array,
    energy: jnp.ndarray,
    mat: jnp.ndarray,
    pmax: jnp.ndarray,
    tables: DeviceTables,
    mask: jnp.ndarray,
    return_accepted: bool = False,
):
    """Sample the Rayleigh (coherent) scattering angle, returns cos_theta
    (plus the acceptance mask when ``return_accepted``).

    RITA rational inverse-transform sampling of the squared molecular form
    factor with Thomson (1+cos^2)/2 angular rejection; energies with
    negligible momentum transfer use pure Thomson sampling.

    The per-material 128-point RITA tables are fetched as whole rows with
    four row-gathers; each rejection trip then finds its CDF interval with a
    vectorised compare-count (identical result to the reference's seeded
    binary search, kernel :1197-1245) and reads the interval endpoints with
    free one-hot selects - no gathers inside the trip loop."""
    n = energy.shape[0]

    xmax = energy * jnp.float32(RAYLEIGH_X_FACTOR)
    # whole per-material RITA rows: [n, 128] each
    xr = tables.rita_x.reshape(-1, NP_RAYLEIGH)[mat]
    pr = tables.rita_p.reshape(-1, NP_RAYLEIGH)[mat]
    ar = tables.rita_a.reshape(-1, NP_RAYLEIGH)[mat]
    br = tables.rita_b.reshape(-1, NP_RAYLEIGH)[mat]
    x_last = xr[:, NP_RAYLEIGH - 1]
    x2max = jnp.minimum(xmax * xmax, x_last)
    small = xmax < 0.01

    iota = jnp.arange(NP_RAYLEIGH, dtype=jnp.int32)[None, :]

    # one RngBitGenerator call for all trips (fusion across trips keeps the
    # [n, 128] RITA rows resident instead of re-reading them per trip)
    u_ray = uniform_open(key, (3 * RAYLEIGH_TRIPS, n))

    def trip(i, carry, u1, u2, u3):
        costh, accepted = carry

        # --- Thomson branch (xmax < 0.01) ---
        costh_t = 1.0 - 2.0 * u1
        accept_t = u2 <= (costh_t * costh_t + 1.0) * 0.5

        # --- RITA branch: interval via compare-count, values via one-hot --
        ru = u1 * pmax
        idx = jnp.clip(
            jnp.sum((pr <= ru[:, None]).astype(jnp.int32), axis=1) - 1,
            0,
            NP_RAYLEIGH - 2,
        )
        oh = (iota == idx[:, None]).astype(jnp.float32)
        oh_next = (iota == (idx + 1)[:, None]).astype(jnp.float32)
        p_i = jnp.sum(pr * oh, axis=1)
        p_n = jnp.sum(pr * oh_next, axis=1)
        x_i = jnp.sum(xr * oh, axis=1)
        x_n = jnp.sum(xr * oh_next, axis=1)
        a_i = jnp.sum(ar * oh, axis=1)
        b_i = jnp.sum(br * oh, axis=1)
        rr = ru - p_i
        d = p_n - p_i
        xx_interp = x_i + (a_i + 1.0 + b_i) * d * rr / (
            d * d + (a_i * d + b_i * rr) * rr
        ) * (x_n - x_i)
        xx = jnp.where(rr > 1e-16, xx_interp, x_i)
        costh_r = 1.0 - 2.0 * xx / jnp.maximum(x2max, 1e-30)
        accept_r = (xx < x2max) & (u3 <= (costh_r * costh_r + 1.0) * 0.5)

        costh_prop = jnp.where(small, costh_t, costh_r)
        accept_now = jnp.where(small, accept_t, accept_r) & ~accepted
        take = accept_now | (~accepted & (i == RAYLEIGH_TRIPS - 1))
        costh = jnp.where(take, jnp.clip(costh_prop, -1.0, 1.0), costh)
        return costh, accepted | accept_now

    carry = (jnp.ones((n,), jnp.float32), ~mask)
    for i in range(RAYLEIGH_TRIPS):
        carry = trip(i, carry, u_ray[3 * i], u_ray[3 * i + 1], u_ray[3 * i + 2])
    costh, accepted = carry
    costh = jnp.where(mask, costh, 1.0)
    if return_accepted:
        return costh, accepted
    return costh


def rayleigh_scatter(
    key: jax.Array,
    energy: jnp.ndarray,
    mat: jnp.ndarray,
    ebin: jnp.ndarray,
    tables: DeviceTables,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Convenience wrapper over :func:`rayleigh_scatter_rows` that fetches
    pmax for the next energy bin, as in the reference (kernel :336)."""
    pmax = tables.rayleigh_pmax[(ebin + 1) * tables.n_mats + mat]
    return rayleigh_scatter_rows(key, energy, mat, pmax, tables, mask)


def rotate_direction(
    dx: jnp.ndarray,
    dy: jnp.ndarray,
    dz: jnp.ndarray,
    costh: jnp.ndarray,
    phi: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rotate unit vectors by polar angle acos(costh) and azimuth phi in the
    vector's self-frame (PENELOPE's DIRECT; reference kernel :1103-1148).
    Renormalises the input when needed."""
    dxy = dx * dx + dy * dy
    norm2 = dxy + dz * dz
    need_norm = jnp.abs(norm2 - 1.0) > 1.0e-7
    inv_norm = jnp.where(need_norm, jax.lax.rsqrt(jnp.maximum(norm2, 1e-30)), 1.0)
    dx = dx * inv_norm
    dy = dy * inv_norm
    dz = dz * inv_norm
    dxy = dx * dx + dy * dy

    sinphi = jnp.sin(phi)
    cosphi = jnp.cos(phi)
    sin2 = jnp.maximum(1.0 - costh * costh, 0.0)

    # generic branch (dxy > 0)
    sdt = jnp.sqrt(sin2 / jnp.maximum(dxy, 1e-28))
    nx = dx * costh + sdt * (dx * dz * cosphi - dy * sinphi)
    ny = dy * costh + sdt * (dy * dz * cosphi + dx * sinphi)
    nz = dz * costh - dxy * sdt * cosphi

    # degenerate branch (dz ~ +-1)
    sdt0 = jnp.sqrt(sin2)
    sign = jnp.sign(dz)
    mx = sign * sdt0 * cosphi
    my = sdt0 * sinphi
    mz = sign * costh

    degenerate = dxy <= 1.0e-28
    return (
        jnp.where(degenerate, mx, nx),
        jnp.where(degenerate, my, ny),
        jnp.where(degenerate, mz, nz),
    )


class FanBeamSource(NamedTuple):
    """Per-projection fan-beam source description (all f32 device scalars or
    [n_proj]-arrays when batched)."""

    position: jnp.ndarray  # [..., 3] focal spot [cm]
    direction: jnp.ndarray  # [..., 3] unit beam direction
    rot_fan: jnp.ndarray  # [..., 3, 3] rotation from +Y frame to direction
    cos_theta_low: jnp.ndarray
    d_cos_theta: jnp.ndarray
    phi_low: jnp.ndarray
    d_phi: jnp.ndarray
    max_height_at_y1cm: jnp.ndarray


def sample_source_direction(
    key: jax.Array, source: FanBeamSource, n: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample fan-beam directions with the PENMAIN square-field rejection
    (uniform in (cos theta, phi) within the aperture, rejected to a square
    field: |w/v| <= tan(theta/2); reference kernel :649-667).

    Returns (dx, dy, dz, accepted). Lanes with accepted=False hold the last
    proposal and should not be used (the caller retries next iteration, so
    the rejection stays unbiased).
    """

    u_src = uniform_open(key, (2 * SOURCE_DIR_TRIPS, n))

    def trip(i, carry, u1, u2):
        dx, dy, dz, accepted = carry
        w = source.cos_theta_low + u1 * source.d_cos_theta
        phi = source.phi_low + u2 * source.d_phi
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
        x = sin_theta * jnp.cos(phi)
        y = sin_theta * jnp.sin(phi)
        ok = jnp.abs(w / (y + 1.0e-7)) <= source.max_height_at_y1cm
        take = ok & ~accepted
        dx = jnp.where(take, x, dx)
        dy = jnp.where(take, y, dy)
        dz = jnp.where(take, w, dz)
        return dx, dy, dz, accepted | ok

    zeros = jnp.zeros((n,), jnp.float32)
    carry = (zeros, jnp.ones((n,), jnp.float32), zeros, jnp.zeros((n,), bool))
    for i in range(SOURCE_DIR_TRIPS):
        carry = trip(i, carry, u_src[2 * i], u_src[2 * i + 1])
    dx, dy, dz, accepted = carry

    # rotate the +Y-frame sample into the beam direction
    r = source.rot_fan
    nx = r[0, 0] * dx + r[0, 1] * dy + r[0, 2] * dz
    ny = r[1, 0] * dx + r[1, 1] * dy + r[1, 2] * dz
    nz = r[2, 0] * dx + r[2, 1] * dy + r[2, 2] * dz
    return nx, ny, nz, accepted


def sample_spectrum_energy(
    key: jax.Array, tables: DeviceTables, n: int
) -> jnp.ndarray:
    """Walker-alias sampling of the source spectrum with intra-bin linear
    interpolation (reference kernel :628-644).

    The per-bin data (cutoff, own bin edges, alias bin edges) is packed into
    one row so the sampler costs a single row-gather."""
    u1, u2 = uniforms_open(key, 2, (n,))
    e_lo = tables.spectrum_energies[:-1]
    de = tables.spectrum_energies[1:] - e_lo
    rows = jnp.stack(
        [
            tables.spectrum_cutoff,
            e_lo,
            de,
            e_lo[tables.spectrum_alias],
            de[tables.spectrum_alias],
        ],
        axis=1,
    )  # [n_spec_bins, 5], assembled at trace time

    rn = u1 * tables.n_spectrum_bins
    int_part = jnp.clip(rn.astype(jnp.int32), 0, tables.n_spectrum_bins - 1)
    frac = rn - int_part.astype(jnp.float32)
    row = rows[int_part]
    use_alias = frac >= row[:, 0]
    e_lo_sel = jnp.where(use_alias, row[:, 3], row[:, 1])
    de_sel = jnp.where(use_alias, row[:, 4], row[:, 2])
    return e_lo_sel + u2 * de_sel


def sample_spectrum_energy_cdf(
    key: jax.Array, tables: DeviceTables, n: int
) -> jnp.ndarray:
    """Gather-free spectrum sampling: bin by broadcast-compare against the
    CDF, bin edges by one-hot reduction, uniform within the bin (the same
    piecewise-uniform law as the Walker alias + intra-bin interpolation of
    :func:`sample_spectrum_energy`, reference kernel :628-644).

    On TPU a gather prices ~3-5 ns per lane-index while a ~120-wide
    compare/select reduction is ~1 ns of VPU work (runs/microbench.json),
    so the engine v4 source stage uses this form."""
    u1, u2 = uniforms_open(key, 2, (n,))
    nb = tables.n_spectrum_bins
    # bin = #{k in 1..nb-1 : u1 >= cdf[k]}  in 0..nb-1
    inner = tables.spectrum_cdf[1:nb]  # [nb-1]
    b = jnp.sum(
        (u1[:, None] >= inner[None, :]).astype(jnp.int32), axis=1
    )
    iota = jnp.arange(nb, dtype=jnp.int32)[None, :]
    oh = (b[:, None] == iota).astype(jnp.float32)
    e_lo = tables.spectrum_energies[:-1]
    de = tables.spectrum_energies[1:] - e_lo
    e_lo_sel = jnp.sum(oh * e_lo[None, :], axis=1)
    de_sel = jnp.sum(oh * de[None, :], axis=1)
    return e_lo_sel + u2 * de_sel
