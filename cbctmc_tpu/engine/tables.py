"""Device-resident physics tables for the transport engine.

Array layouts are chosen for cheap gathers on TPU:

- per-(energy-bin, material) inverse-MFP interpolation coefficients are
  flattened so one gather of a row yields everything needed at an
  interaction site,
- the Woodcock majorant (a, b) pair is carried per photon and re-gathered
  only when the energy changes (Compton), so the hot virtual-event loop
  does a single 2-float gather for the current material's total MFP.

The interpolation algebra mirrors the reference engine's table construction
(docker/mcgpu/MC-GPU_v1.3.cu:2287-2358) so cross sections agree to float32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.physics.materials import (
    MaterialTableSet,
    build_woodcock_coefficients,
    linearize_inverse_mfp,
)
from cbctmc_tpu.physics.spectrum import Spectrum


class DeviceTables(NamedTuple):
    """Physics tables as device arrays (a JAX pytree of arrays + aux)."""

    # energy grid
    e0: jnp.ndarray  # scalar f32 [eV]
    ide: jnp.ndarray  # scalar f32 [1/eV]

    # inverse-MFP linear coefficients scaled by nominal density:
    # inv_mfp(E) = a + E*b. Row layout: [n_bins * n_mats, :].
    # total only (hot path):    [.., 2] = (aT, bT)
    mfp_total_ab: jnp.ndarray
    # compton+rayleigh (event path): [.., 4] = (aC, bC, aR, bR)
    mfp_cr_ab: jnp.ndarray

    # Rayleigh max cumulative F^2 probability [n_bins * n_mats]
    rayleigh_pmax: jnp.ndarray

    # RITA tables, flattened [n_mats * 128]
    rita_x: jnp.ndarray
    rita_p: jnp.ndarray
    rita_a: jnp.ndarray
    rita_b: jnp.ndarray
    rita_itl: jnp.ndarray  # i32, 1-based
    rita_itu: jnp.ndarray  # i32, 1-based

    # Compton shells [n_mats, max_shells]; padded shells have ui=+inf
    shell_f: jnp.ndarray
    shell_ui: jnp.ndarray
    shell_j0: jnp.ndarray

    # incoherent scattering function at theta=pi, tabulated on the energy
    # grid [n_bins * n_mats] (the rejection-envelope normalisation of the
    # Compton sampler; tabulated to avoid a full shell pass per photon)
    compton_s0: jnp.ndarray

    # inverse CDF of the Compton scattering angle (engine v3.4b): cdt1 =
    # 1 - cos(theta) at K equal-probability knots of the exact
    # Klein-Nishina x S(E, theta) angular distribution, on a coarse
    # log-energy grid [n_icdf_energies * n_mats, K]. Sampling is one row
    # gather + a linear interpolation - no rejection trips (the tau loop
    # of the analytic GCOa path). Energy interpolation is stochastic
    # (PENELOPE-style statistical interpolation between grid rows).
    compton_icdf: jnp.ndarray
    icdf_log_lo: jnp.ndarray  # f32 scalar log(E_first)
    icdf_log_hi: jnp.ndarray  # f32 scalar log(E_last)

    @property
    def n_icdf_energies(self) -> int:
        return self.compton_icdf.shape[0] // self.shell_f.shape[0]

    # spectrum sampling
    spectrum_energies: jnp.ndarray  # [n_spec_bins + 1]
    spectrum_cutoff: jnp.ndarray  # [n_spec_bins]
    spectrum_alias: jnp.ndarray  # i32 [n_spec_bins]

    # ---- engine v4: gather-free sigma + tabulated Rayleigh angle ---------
    # Per-material Chebyshev fits (+ K-edge step) of the partial inverse
    # MFPs per unit density (the linearize_inverse_mfp scaling):
    # sigma_cheb [n_mats, 3, D] ascending Chebyshev coefficients over
    # s = 2t - 1, t = (log E - sigma_log_lo)/(sigma_log_hi - sigma_log_lo),
    # channels (Compton, Rayleigh, photoelectric);
    # sigma_edge [n_mats, 3, 2] = (s_edge, step):
    # log sigma = clenshaw(cheb, s) + step * 1[s >= s_edge] (Fe K-edge in
    # blood/red marrow). inv_tot := exp(pC) + exp(pR) + exp(pP) keeps the
    # flight's delta-tracking probability and the event stage's branch
    # ratios exactly consistent. A tight (non-conservative) fit: max
    # relative error <~3e-4 per channel (tests/test_tables_v4.py), far
    # below the <=1% projection-RMSE parity bar; evaluation is free VPU
    # work where the v3 fused-index table gathers priced ~2-3.5 ns/lane
    # (runs/microbench.json).
    sigma_cheb: jnp.ndarray
    sigma_edge: jnp.ndarray
    sigma_log_lo: jnp.ndarray  # f32 scalar log(e0)
    sigma_log_hi: jnp.ndarray  # f32 scalar log(e_last)
    # Rayleigh angular inverse CDF (same scheme/grid/knots as compton_icdf):
    # cdt1 = 1 - cos(theta) = 2 x^2 / x2max(E) knots of the exact
    # RITA-form-factor x Thomson accepted distribution,
    # [n_icdf_energies * n_mats, K]. One row gather + lerp replaces the
    # 12-trip RITA rejection (whose 128-wide compare-counts and one-hot
    # selects dominate an uncompacted event stage).
    rayleigh_icdf: jnp.ndarray
    # spectrum CDF [n_spec_bins + 1] (normalised, f32) for gather-free
    # broadcast-compare inverse-CDF sampling (engine v4 spectrum_mode="cdf")
    spectrum_cdf: jnp.ndarray

    @property
    def n_mats(self) -> int:
        return self.shell_f.shape[0]

    @property
    def max_shells(self) -> int:
        return self.shell_f.shape[1]

    @property
    def n_spectrum_bins(self) -> int:
        return self.spectrum_cutoff.shape[0]


#: shells per material after physics-preserving merging (below). 14 keeps
#: the incoherent scattering function S(E, theta) within 5e-4 of s0 for
#: every material over the 6-125 keV grid while cutting the [shells, lanes]
#: event math ~3x (max raw shell count is 40, mostly near-duplicates).
MAX_MERGED_SHELLS = 14


def _merge_shells(
    f: np.ndarray, ui: np.ndarray, j0: np.ndarray, max_shells: int
):
    """Agglomeratively merge Compton shells with similar (ui, j0).

    Pair cost = reduced occupation * squared log-distance in (ui, j0), so
    low-occupancy near-duplicates merge first and high-f / deep shells are
    preserved. Merged values are f-weighted geometric means; summed f keeps
    S(E, pi) = Z exact. The reference carries every PENELOPE shell
    (MAX_SHELLS=40, MC-GPU_v1.3.h:62) because per-thread loops are cheap on
    a GPU; on TPU the [shells, lanes] vector math prices every padded row.
    """
    pts = [
        (float(fi), float(u), float(g))
        for fi, u, g in zip(f, ui, j0)
        if fi > 0
    ]
    while len(pts) > max_shells:
        best, bi, bj = np.inf, 0, 1
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d = (
                    np.log(pts[i][1] / pts[j][1]) ** 2
                    + np.log(pts[i][2] / pts[j][2]) ** 2
                )
                w = pts[i][0] * pts[j][0] / (pts[i][0] + pts[j][0])
                if w * d < best:
                    best, bi, bj = w * d, i, j
        fi, ui_i, j0_i = pts[bi]
        fj, ui_j, j0_j = pts[bj]
        fm = fi + fj
        um = np.exp((fi * np.log(ui_i) + fj * np.log(ui_j)) / fm)
        jm = np.exp((fi * np.log(j0_i) + fj * np.log(j0_j)) / fm)
        pts = [p for k, p in enumerate(pts) if k not in (bi, bj)]
        pts.append((fm, um, jm))
    pts.sort(key=lambda p: p[1])
    return (
        np.array([p[0] for p in pts], np.float32),
        np.array([p[1] for p in pts], np.float32),
        np.array([p[2] for p in pts], np.float32),
    )


def build_device_tables(
    table_set: MaterialTableSet,
    spectrum: Spectrum,
    max_merged_shells: int | None = MAX_MERGED_SHELLS,
) -> DeviceTables:
    n_mats = table_set.n_materials
    densities = table_set.densities

    def stack(attr):
        return np.stack([getattr(m, attr) for m in table_set.materials])

    a_tot, b_tot = linearize_inverse_mfp(
        stack("mfp_total"), densities, table_set.e0, table_set.de
    )
    a_com, b_com = linearize_inverse_mfp(
        stack("mfp_compton"), densities, table_set.e0, table_set.de
    )
    a_ray, b_ray = linearize_inverse_mfp(
        stack("mfp_rayleigh"), densities, table_set.e0, table_set.de
    )

    # [n_mats, n_bins, c] -> [n_bins * n_mats, c] with row = bin * n_mats + mat
    def flat(*cols):
        return np.stack(cols, axis=-1).transpose(1, 0, 2).reshape(-1, len(cols))

    mfp_total_ab = flat(a_tot, b_tot)
    mfp_cr_ab = flat(a_com, b_com, a_ray, b_ray)
    rayleigh_pmax = stack("rayleigh_pmax").T.reshape(-1)

    merged = [
        _merge_shells(m.shell_f, m.shell_ui, m.shell_j0, max_merged_shells)
        if max_merged_shells else (m.shell_f, m.shell_ui, m.shell_j0)
        for m in table_set.materials
    ]
    max_shells = max(len(f) for f, _, _ in merged)
    shell_f = np.zeros((n_mats, max_shells), np.float32)
    shell_ui = np.full((n_mats, max_shells), np.float32(np.inf))
    shell_j0 = np.full((n_mats, max_shells), np.float32(1.0))
    for i, (f, ui, j0) in enumerate(merged):
        shell_f[i, : len(f)] = f
        shell_ui[i, : len(f)] = ui
        shell_j0[i, : len(f)] = j0

    compton_s0 = _tabulate_compton_s0(
        shell_f, shell_ui, shell_j0, table_set.e0, table_set.de, table_set.n_bins
    )
    e_last = table_set.e0 + table_set.de * (table_set.n_bins - 1)
    compton_icdf = _tabulate_compton_tau_icdf(
        shell_f, shell_ui, shell_j0, table_set.e0, e_last
    )
    rayleigh_icdf = _tabulate_rayleigh_icdf(table_set, table_set.e0, e_last)
    sigma_cheb = np.zeros((n_mats, 3, SIGMA_CHEB_DEGREE + 1), np.float32)
    sigma_edge = np.zeros((n_mats, 3, 2), np.float32)
    for mi, m in enumerate(table_set.materials):
        for ci, curve in enumerate(
            (m.mfp_compton, m.mfp_rayleigh, m.mfp_photoelectric)
        ):
            coefs, s_edge, step = fit_log_sigma_cheb(
                1.0 / (np.asarray(curve, np.float64) * float(m.density)),
                table_set.e0,
                table_set.de,
            )
            sigma_cheb[mi, ci] = coefs
            sigma_edge[mi, ci] = (s_edge, step)

    p64 = np.asarray(spectrum.probabilities, np.float64)
    spectrum_cdf = np.concatenate([[0.0], np.cumsum(p64 / p64.sum())])
    spectrum_cdf[-1] = 1.0

    return DeviceTables(
        e0=jnp.float32(table_set.e0),
        ide=jnp.float32(1.0 / table_set.de),
        mfp_total_ab=jnp.asarray(mfp_total_ab),
        mfp_cr_ab=jnp.asarray(mfp_cr_ab),
        rayleigh_pmax=jnp.asarray(rayleigh_pmax),
        rita_x=jnp.asarray(stack("rita_x").reshape(-1)),
        rita_p=jnp.asarray(stack("rita_p").reshape(-1)),
        rita_a=jnp.asarray(stack("rita_a").reshape(-1)),
        rita_b=jnp.asarray(stack("rita_b").reshape(-1)),
        rita_itl=jnp.asarray(stack("rita_itl").reshape(-1).astype(np.int32)),
        rita_itu=jnp.asarray(stack("rita_itu").reshape(-1).astype(np.int32)),
        shell_f=jnp.asarray(shell_f),
        shell_ui=jnp.asarray(shell_ui),
        shell_j0=jnp.asarray(shell_j0),
        compton_s0=jnp.asarray(compton_s0),
        compton_icdf=jnp.asarray(compton_icdf),
        icdf_log_lo=jnp.float32(np.log(table_set.e0)),
        icdf_log_hi=jnp.float32(np.log(e_last)),
        spectrum_energies=jnp.asarray(spectrum.energies),
        spectrum_cutoff=jnp.asarray(spectrum.cutoff),
        spectrum_alias=jnp.asarray(spectrum.alias.astype(np.int32)),
        sigma_cheb=jnp.asarray(sigma_cheb),
        sigma_edge=jnp.asarray(sigma_edge),
        sigma_log_lo=jnp.float32(np.log(table_set.e0)),
        sigma_log_hi=jnp.float32(np.log(e_last)),
        rayleigh_icdf=jnp.asarray(rayleigh_icdf),
        spectrum_cdf=jnp.asarray(spectrum_cdf.astype(np.float32)),
    )


def _tabulate_compton_s0(
    shell_f: np.ndarray,
    shell_ui: np.ndarray,
    shell_j0: np.ndarray,
    e0: float,
    de: float,
    n_bins: int,
) -> np.ndarray:
    """Tabulate S(E, theta=pi) = sum_i f_i n_i(pz_max,i) on the energy grid
    for every material; row layout [n_bins * n_mats] (bin-major)."""
    mec2 = 510998.918
    energies = (e0 + de * np.arange(n_bins, dtype=np.float64))[:, None, None]
    f = shell_f[None].astype(np.float64)
    ui = shell_ui[None].astype(np.float64)
    j0 = shell_j0[None].astype(np.float64)

    open_shell = ui < energies
    ui = np.where(open_shell, ui, 0.0)
    aux = energies * (energies - ui) * 2.0
    pz = j0 * (aux - ui * mec2) / (np.sqrt(aux + aux + ui * ui) * mec2)
    t = (1.0 / np.sqrt(2.0) + np.abs(pz) * np.sqrt(2.0)) ** 2
    n_pz = 0.5 * np.exp(np.minimum(0.5 - t, 0.0))
    n_pz = np.where(pz > 0, 1.0 - n_pz, n_pz)
    s0 = np.sum(np.where(open_shell, f * n_pz, 0.0), axis=-1)  # [n_bins, n_mats]
    return s0.reshape(-1).astype(np.float32)


def fit_log_mfp_poly(
    mfp_curve: np.ndarray,
    e0: float,
    de: float,
    degree: int = 8,
    oversample: int = 4,
) -> np.ndarray:
    """Fit ``log(mfp(E))`` with a polynomial in the normalised log-energy
    ``t = (log E - log E0) / (log E1 - log E0)`` and shift it down so that
    ``exp(poly(t)) <= mfp(E)`` EVERYWHERE on an oversampled grid of the
    piecewise-linear table curve.

    A Woodcock majorant only needs ``mfp_samp <= min-MFP`` for unbiased
    delta tracking (the under-estimate costs extra virtual flights, it
    never biases the physics); a degree-8 fit stays within ~2% of the
    tabulated curve, which replaces the per-lane majorant-table gathers in
    the transport hot loop with ~8 register FMAs + one exp (gathers price
    per lane-index on TPU; polynomial evaluation is free VPU work).

    Returns descending-order coefficients [degree+1] for Horner evaluation.
    """
    n_bins = mfp_curve.shape[0]
    energies = e0 + de * np.arange(n_bins, dtype=np.float64)
    # HARMONIC oversampling between the table knots: every tier's true
    # acceptance curve is the reciprocal of a piecewise-linear inverse MFP
    # (the per-material (a, b) inv tables; linearize_inverse_mfp for air),
    # and the reciprocal-of-interpolated-inverse lies BELOW both the linear
    # chord of the MFP knots (AM-HM) and the true min-MFP curve (a max of
    # linear functions is >= the chord through its knot values), so fitting
    # below it is conservative at mid-bin energies too, not only at knots
    e_fine = e0 + (de / oversample) * np.arange(
        (n_bins - 1) * oversample + 1, dtype=np.float64
    )
    inv_fine = np.interp(
        e_fine, energies,
        1.0 / np.maximum(np.asarray(mfp_curve, np.float64), 1e-300),
    )
    mfp_fine = 1.0 / np.maximum(inv_fine, 1e-300)
    lo, hi = np.log(energies[0]), np.log(energies[-1])
    t = (np.log(e_fine) - lo) / (hi - lo)
    coeffs = np.polyfit(t, np.log(mfp_fine), degree)
    over = np.max(np.polyval(coeffs, t) - np.log(mfp_fine))
    # the extra 1e-4 log-margin absorbs float32 Horner rounding at runtime
    coeffs[-1] -= max(over, 0.0) + 1e-4
    return coeffs.astype(np.float32)


def _tabulate_compton_tau_icdf(
    shell_f: np.ndarray,
    shell_ui: np.ndarray,
    shell_j0: np.ndarray,
    e_first: float,
    e_last: float,
    n_energies: int = 64,
    n_knots: int = 64,
    n_fine: int = 4096,
) -> np.ndarray:
    """Tabulate the inverse CDF of the Compton scattering angle.

    The GCOa tau-rejection loop (reference kernel :1342-1403) samples tau
    from the Klein-Nishina composition proposal g(tau) and accepts with
    probability proportional to S(E, theta)/S(E, pi) x the KN angular
    factor; the accepted density is f(tau) ~ g(tau) * t_kn(tau). Here that
    exact density is integrated numerically per (coarse log-energy, material)
    and inverted at ``n_knots`` equal-probability knots of
    cdt1 = 1 - cos(theta) = (1 - tau)/(tau * ek). Sampling then costs one
    row gather + one linear interpolation instead of 16 masked rejection
    trips over the shell table - and is *exact to table resolution*
    (piecewise-uniform between knots, O(1/K^2) distribution error,
    validated by chi-square against the analytic sampler in
    tests/test_sampler_statistics.py).

    Rows are [n_energies * n_mats, n_knots] at idx = ie * n_mats + mat with
    ie on a log grid over [e_first, e_last].
    """
    mec2 = 510998.918
    n_mats, _ = shell_f.shape
    energies = np.exp(
        np.linspace(np.log(e_first), np.log(e_last), n_energies)
    )
    out = np.empty((n_energies, n_mats, n_knots), np.float32)
    u_knots = np.linspace(0.0, 1.0, n_knots)

    for ie, e in enumerate(energies):
        ek = e / mec2
        ek2 = 2.0 * ek + 1.0
        ek3 = ek * ek
        ek1 = ek3 - ek2 - 1.0
        taumin = 1.0 / ek2
        # fine tau grid; log spacing resolves the 1/tau proposal tail
        tau = np.exp(np.linspace(np.log(taumin), 0.0, n_fine))
        cdt1 = np.minimum((1.0 - tau) / (tau * ek), 1.99999999)

        # g(tau): the KN composition proposal (log branch ~ 1/tau, sqrt
        # branch ~ tau); overall normalisation cancels in the CDF
        g = 1.0 / tau + tau

        # S(E, theta): sum of shell profile integrals at pz_max(cdt1)
        f = shell_f[None, :, :]  # [1, n_mats, s]
        open_shell = shell_ui[None] < e
        ui = np.where(open_shell, shell_ui[None], 0.0)
        j0 = shell_j0[None]
        aux = e * (e - ui) * cdt1[:, None, None]
        pz = (
            j0 * (aux - ui * mec2)
            / (np.sqrt(np.maximum(aux + aux + ui * ui, 1e-30)) * mec2)
        )
        t = (1.0 / np.sqrt(2.0) + np.abs(pz) * np.sqrt(2.0)) ** 2
        n_pz = 0.5 * np.exp(np.minimum(0.5 - t, 0.0))
        n_pz = np.where(pz > 0, 1.0 - n_pz, n_pz)
        s = np.sum(np.where(open_shell, f * n_pz, 0.0), axis=-1)  # [fine, m]

        kn = (
            (1.0 + tau * (ek1 + tau * (ek2 + tau * ek3)))
            / (ek3 * tau * (tau * tau + 1.0))
        )
        pdf = g[:, None] * kn[:, None] * s  # [fine, n_mats]

        # integrate over tau and invert the CDF in cdt1 (cdt1 decreases
        # monotonically with tau, so flip for np.interp)
        cdf = np.cumsum(
            0.5 * (pdf[1:] + pdf[:-1]) * np.diff(tau)[:, None], axis=0
        )
        cdf = np.vstack([np.zeros((1, n_mats)), cdf])
        for m in range(n_mats):
            c = cdf[:, m] / max(cdf[-1, m], 1e-30)
            # CDF over tau maps to SURVIVAL over cdt1: P(CDT1 <= x) =
            # 1 - P(tau <= tau(x)); both (1-c) and cdt1 reversed are
            # increasing, as np.interp requires
            out[ie, m] = np.interp(
                u_knots, (1.0 - c)[::-1], cdt1[::-1]
            ).astype(np.float32)
    return out.reshape(n_energies * n_mats, n_knots)


#: Chebyshev degree of the sigma fits. 23 puts every material/channel below
#: ~3e-4 max relative error (the binding case is the bone materials'
#: Rayleigh form-factor structure); evaluation cost is irrelevant (VPU).
SIGMA_CHEB_DEGREE = 23


def fit_log_sigma_cheb(
    inv_curve: np.ndarray,
    e0: float,
    de: float,
    degree: int = SIGMA_CHEB_DEGREE,
) -> tuple[np.ndarray, float, float]:
    """Tight fit of ``log(inv_curve(E))`` as Chebyshev series + absorption-
    edge step over ``s = 2t - 1``, ``t = (log E - log E0)/(log E1 - log E0)``.

    Unlike :func:`fit_log_mfp_poly` (majorants, which must bound the curve
    one-sidedly), the sigma fits replace the cross-section values
    themselves, so they are least-squares tight. Most 5-125 keV partial
    inverse MFPs are smooth in log-log, but iron-bearing materials (blood,
    red marrow) have the Fe K-edge at 7.11 keV inside the grid - a jump no
    global polynomial can fit. The fit therefore models
    ``log sigma = cheb(s) + step * 1[s >= s_edge]``: the largest
    outlier jump in the 5 eV finite differences is detected, removed, and
    re-applied at runtime with a single select.

    Chebyshev coefficients (evaluated with the Clenshaw recurrence in the
    engine) stay O(10), so float32 evaluation adds < 1e-5 relative error
    where the equivalent power-basis Horner loses ~2e-4 to coefficient
    cancellation (|c| ~ 2e3 at degree 23).

    Returns ``(coeffs ascending [degree+1], s_edge, step)``; ``s_edge = 2.0``
    (never reached) when no edge is detected.
    """
    n_bins = inv_curve.shape[0]
    energies = e0 + de * np.arange(n_bins, dtype=np.float64)
    lo, hi = np.log(energies[0]), np.log(energies[-1])
    s = 2.0 * (np.log(energies) - lo) / (hi - lo) - 1.0
    y = np.log(np.maximum(np.asarray(inv_curve, np.float64), 1e-300))

    d = np.diff(y)
    k = int(np.argmax(np.abs(d)))
    med = float(np.median(np.abs(d)))
    step, s_edge = 0.0, 2.0
    if abs(d[k]) > 20.0 * max(med, 1e-12) and abs(d[k]) > 5e-3:
        smooth = 0.5 * (d[max(k - 2, 0)] + d[min(k + 2, len(d) - 1)])
        step = float(d[k] - smooth)
        s_edge = float(s[k + 1])
        y = y - step * (np.arange(n_bins) >= k + 1)

    cheb = np.polynomial.chebyshev.Chebyshev.fit(s, y, degree, domain=[-1, 1])
    return cheb.coef.astype(np.float32), s_edge, step


def sigma_coeff_table(tables: DeviceTables) -> jnp.ndarray:
    """Concatenated per-material sigma-fit rows for ONE one-hot MXU fetch:
    [n_mats, 3*D + 6] = (cheb coefficients of the 3 channels | the 3
    (s_edge, step) pairs)."""
    n_mats = tables.n_mats
    return jnp.concatenate(
        [
            tables.sigma_cheb.reshape(n_mats, -1),
            tables.sigma_edge.reshape(n_mats, -1),
        ],
        axis=1,
    )


def eval_sigma_partials(
    tables: DeviceTables,
    energy: jnp.ndarray,
    onehot_mat: jnp.ndarray,
    coeff_table: jnp.ndarray | None = None,
):
    """Per-lane partial inverse MFPs per unit density, gather-free:
    one one-hot MXU matmul fetches each lane's Chebyshev rows + edge pairs,
    then a float32 Clenshaw recurrence per channel evaluates
    ``exp(cheb(s) + step * 1[s >= s_edge])``.

    Args:
        energy: [n] photon energies [eV].
        onehot_mat: [n, n_mats] float32 one-hot of the lane materials
            (shared with the Compton shell fetch in the event stage).
    Returns:
        (inv_compton, inv_rayleigh, inv_photoelectric), each [n].
    """
    if coeff_table is None:
        coeff_table = sigma_coeff_table(tables)
    d = tables.sigma_cheb.shape[-1]
    rows = jax.lax.dot_general(
        onehot_mat, coeff_table,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [n, 3*D + 6]
    s = jnp.clip(
        2.0
        * (jnp.log(energy) - tables.sigma_log_lo)
        / (tables.sigma_log_hi - tables.sigma_log_lo)
        - 1.0,
        -1.0,
        1.0,
    )
    two_s = 2.0 * s

    def channel(ci):
        c = rows[:, ci * d : (ci + 1) * d]
        b1 = jnp.zeros_like(s)
        b2 = jnp.zeros_like(s)
        for k in range(d - 1, 0, -1):
            b1, b2 = c[:, k] + two_s * b1 - b2, b1
        val = c[:, 0] + s * b1 - b2
        s_edge = rows[:, 3 * d + 2 * ci]
        step = rows[:, 3 * d + 2 * ci + 1]
        return jnp.exp(val + jnp.where(s >= s_edge, step, 0.0))

    return channel(0), channel(1), channel(2)


def _tabulate_rayleigh_icdf(
    table_set: MaterialTableSet,
    e_first: float,
    e_last: float,
    n_energies: int = 64,
    n_knots: int = 64,
    n_fine: int = 8192,
) -> np.ndarray:
    """Tabulate the inverse CDF of the Rayleigh scattering angle.

    The reference samples x^2 from the RITA rational interpolation of the
    squared-form-factor CDF truncated at x2max(E) and rejects with the
    Thomson factor (1+cos^2)/2 (kernel GRAa :1181-1246). The accepted
    density over p (the form-factor CDF coordinate) is therefore
    ``th(x(p)) * 1[x(p) <= x2max]``: here it is integrated on a fine uniform
    p grid (x(p) via the same rational map the sampler uses) and inverted at
    ``n_knots`` equal-probability knots of cdt1 = 1 - cos(theta) =
    2 x^2 / x2max. Layout matches ``compton_icdf``:
    [n_energies * n_mats, n_knots] at idx = ie * n_mats + mat on the same
    log-energy grid, so the transport engine fetches Compton OR Rayleigh
    angles with ONE gather into the concatenated table.
    """
    from cbctmc_tpu.physics.constants import RAYLEIGH_X_FACTOR

    n_mats = table_set.n_materials
    energies = np.exp(np.linspace(np.log(e_first), np.log(e_last), n_energies))
    out = np.empty((n_energies, n_mats, n_knots), np.float32)
    u_knots = np.linspace(0.0, 1.0, n_knots)

    for mi, m in enumerate(table_set.materials):
        xr = np.asarray(m.rita_x, np.float64)
        pr = np.asarray(m.rita_p, np.float64)
        ar = np.asarray(m.rita_a, np.float64)
        br = np.asarray(m.rita_b, np.float64)
        pmax_curve = np.asarray(m.rayleigh_pmax, np.float64)
        e_grid = m.e0 + m.de * np.arange(len(pmax_curve), dtype=np.float64)

        for ie, e in enumerate(energies):
            xmax = e * RAYLEIGH_X_FACTOR
            x2max = min(xmax * xmax, float(xr[-1]))
            # conservative CDF bound at this energy (the sampler's pmax at
            # bin+1); fine-grid points mapping beyond x2max carry no weight
            pmax = float(np.interp(e + m.de, e_grid, pmax_curve))
            p_fine = np.linspace(0.0, min(pmax, float(pr[-1])), n_fine)
            idx = np.clip(np.searchsorted(pr, p_fine, side="right") - 1,
                          0, len(pr) - 2)
            rr = p_fine - pr[idx]
            d = pr[idx + 1] - pr[idx]
            with np.errstate(divide="ignore", invalid="ignore"):
                xx = xr[idx] + np.where(
                    rr > 1e-16,
                    (ar[idx] + 1.0 + br[idx]) * d * rr
                    / (d * d + (ar[idx] * d + br[idx] * rr) * rr)
                    * (xr[idx + 1] - xr[idx]),
                    0.0,
                )
            # truncate to the accepted region (xx <= x2max): beyond it the
            # Thomson weight is zero and the flat tail would corrupt the
            # inversion at u -> 1
            inside = np.flatnonzero(xx <= x2max)
            hi_i = int(inside[-1]) if inside.size else 1
            xx_in = xx[: hi_i + 1]
            mu = 1.0 - 2.0 * xx_in / max(x2max, 1e-300)
            w = 0.5 * (1.0 + mu * mu)
            cdf = np.concatenate([[0.0], np.cumsum(0.5 * (w[1:] + w[:-1]))])
            total = max(cdf[-1], 1e-300)
            cdt1_grid = 2.0 * xx_in / max(x2max, 1e-300)
            # cdf and cdt1_grid both increase with p -> direct inversion
            out[ie, mi] = np.interp(
                u_knots, cdf / total, cdt1_grid
            ).astype(np.float32)
    return out.reshape(n_energies * n_mats, n_knots)


class WoodcockTable(NamedTuple):
    """Per-geometry Woodcock majorant MFP interpolation tables:
    mfp(E) = a + E * b [bin].

    ``(a, b)`` is the classic full-scene majorant (minimum MFP over every
    material at its scene-max density, reference MC-GPU_v1.3.cu:2293-2296).
    ``(soft_a, soft_b)`` is a second, *looser* majorant valid only away
    from "heavy" voxels (bone / teflon / aluminium inserts): CT scenes are
    dominated by ~water-density tissue, but the full majorant is set by the
    densest insert, wasting ~2-3x of all Woodcock flights as virtual events
    in soft tissue. Flights whose soft-clearance level (packed in the voxel
    word, transport.make_voxel_volume) guarantees a heavy-free box sample
    against the soft majorant with the step clamped to the clearance radius
    (clamped steps are null events - delta tracking with a piecewise
    majorant stays unbiased by the memoryless property)."""

    a: jnp.ndarray  # [n_bins]
    b: jnp.ndarray  # [n_bins]
    soft_a: jnp.ndarray  # [n_bins]
    soft_b: jnp.ndarray  # [n_bins]
    # conservative log-MFP polynomial fits (engine v3.4): descending Horner
    # coefficients over t = (log E - log_e_lo)/(log_e_hi - log_e_lo), with
    # exp(poly) <= the tabulated curve everywhere (fit_log_mfp_poly)
    wc_logpoly: jnp.ndarray  # [degree+1]
    soft_logpoly: jnp.ndarray  # [degree+1]
    air_logpoly: jnp.ndarray  # [degree+1] nominal-density air MFP
    log_e_lo: jnp.ndarray  # f32 scalar
    log_e_hi: jnp.ndarray  # f32 scalar


def build_woodcock_table(
    table_set: MaterialTableSet,
    max_density: np.ndarray,
    soft_max_density: np.ndarray | None = None,
) -> WoodcockTable:
    a, b = build_woodcock_coefficients(table_set, max_density)
    if soft_max_density is not None and (soft_max_density > 0).any():
        sa, sb = build_woodcock_coefficients(table_set, soft_max_density)
    else:
        sa, sb = a, b
    e0, de, n_bins = table_set.e0, table_set.de, len(a)
    energies = e0 + de * np.arange(n_bins, dtype=np.float64)
    wc_poly = fit_log_mfp_poly(np.asarray(a) + energies * np.asarray(b), e0, de)
    soft_poly = fit_log_mfp_poly(
        np.asarray(sa) + energies * np.asarray(sb), e0, de
    )
    # air majorant: the nominal-density air MFP curve; the engine divides by
    # the scene's max quantised air density (VoxelVolume.air_den_max), which
    # preserves the conservative direction (fit-below / max density)
    air = table_set.materials[0]  # density-sorted registry: air is first
    a_air, b_air = linearize_inverse_mfp(
        np.asarray(air.mfp_total)[None], np.array([air.density]), e0, de
    )
    inv_air = np.maximum(a_air[0] + energies * b_air[0], 1e-30)
    air_poly = fit_log_mfp_poly(1.0 / inv_air, e0, de)
    return WoodcockTable(
        a=jnp.asarray(a), b=jnp.asarray(b),
        soft_a=jnp.asarray(sa), soft_b=jnp.asarray(sb),
        wc_logpoly=jnp.asarray(wc_poly),
        soft_logpoly=jnp.asarray(soft_poly),
        air_logpoly=jnp.asarray(air_poly),
        log_e_lo=jnp.float32(np.log(energies[0])),
        log_e_hi=jnp.float32(np.log(energies[-1])),
    )


def split_heavy_voxels(
    table_set: MaterialTableSet,
    materials_0based: np.ndarray,
    densities: np.ndarray,
    air_material: int = 0,
    soft_quantile: float = 0.90,
) -> tuple[np.ndarray, np.ndarray]:
    """Scene-driven majorant split for the two-tier Woodcock scheme.

    A voxel's majorant requirement is its worst-bin total inverse MFP,
    ``peak(v) = den(v) * max_E sigma_m(v)(E)/rho_nominal``. The soft tier
    covers at least ``soft_quantile`` of the non-air voxels: the threshold
    is the quantile of ``peak`` over non-air voxels, and every voxel above
    it is "heavy" (excluded from the soft majorant and blocked in the
    soft-clearance field). In a CatPhan/patient scene this lands just above
    soft tissue, so the bone/teflon/aluminium inserts are heavy and the
    water-dominated bulk flies against a ~2-3x longer majorant MFP.

    Returns ``(heavy_mask bool[vox], soft_max_density f32[n_mats])`` -
    feed them to :func:`transport.make_voxel_volume` and
    :func:`build_woodcock_table` respectively. For a uniform scene the
    heavy mask is empty and the soft tier degenerates to the full majorant.
    """
    inv_peak_perden = np.array(
        [
            (1.0 / np.asarray(m.mfp_total, np.float64)).max() / d
            for m, d in zip(table_set.materials, table_set.densities)
        ]
    )
    mats = materials_0based.reshape(-1)
    dens = np.asarray(densities, np.float64).reshape(-1)
    peak = inv_peak_perden[mats] * dens
    nonair = mats != air_material
    if not nonair.any():
        return (
            np.zeros(materials_0based.shape, bool),
            np.zeros(table_set.n_materials, np.float32),
        )
    tau = float(np.quantile(peak[nonair], soft_quantile))
    heavy = (peak > tau * (1.0 + 1e-6)).reshape(materials_0based.shape)
    soft_max_density = np.zeros(table_set.n_materials, np.float32)
    soft_flat = ~heavy.reshape(-1)
    np.maximum.at(
        soft_max_density, mats[soft_flat], dens[soft_flat].astype(np.float32)
    )
    return heavy, soft_max_density
