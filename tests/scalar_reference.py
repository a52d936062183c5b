"""Scalar (per-photon, sequential-rejection) reference implementations of the
PENELOPE-2006 sampling algorithms, used as ground truth for the vectorized
engine samplers. Deliberately written in the straightforward sequential form
(one history at a time, unbounded rejection loops) so agreement with the
masked fixed-trip vector versions validates that the vectorisation introduced
no bias."""

import numpy as np

MEC2 = 510998.918
INV_MEC2 = 1.956951306108245e-6


def profile_integral(pz):
    t = (0.70710678118654502 + abs(pz) * 1.4142135623731) ** 2
    val = 0.5 * np.exp(min(0.5 - t, 0.0))
    return 1.0 - val if pz > 0 else val


def shell_pzomc(energy, ui, j0, cdt1):
    aux = energy * (energy - ui) * cdt1
    if aux > 1e-12 or ui > 1e-12:
        return j0 * (aux - ui * MEC2) / (np.sqrt(aux + aux + ui * ui) * MEC2)
    return 0.002


def compton_scalar(rng, energy, shells):
    """shells: list of (f, ui, j0). Returns (new_energy, costh)."""
    ek = energy * INV_MEC2
    ek2 = 2 * ek + 1
    ek3 = ek * ek
    ek1 = ek3 - ek2 - 1
    taumin = 1.0 / ek2
    a1 = np.log(ek2)
    a2 = a1 + 2 * ek * (ek + 1) * taumin * taumin

    s0 = sum(
        f * profile_integral(shell_pzomc(energy, ui, j0, 2.0))
        for f, ui, j0 in shells
        if ui < energy
    )

    while True:
        if rng.random() * a2 < a1:
            tau = taumin ** rng.random()
        else:
            tau = np.sqrt(1 + rng.random() * (taumin * taumin - 1))
        cdt1 = min((1 - tau) / (tau * energy * INV_MEC2), 1.99999999)
        rn = {}
        s = 0.0
        for i, (f, ui, j0) in enumerate(shells):
            if ui < energy:
                rn[i] = profile_integral(shell_pzomc(energy, ui, j0, cdt1))
                s += f * rn[i]
        t_kn = (1 + tau * (ek1 + tau * (ek2 + tau * ek3))) / (
            ek3 * tau * (tau * tau + 1)
        )
        if rng.random() * s0 <= s * t_kn:
            break
    costh = 1.0 - cdt1

    # target shell and Doppler momentum
    while True:
        target = s * rng.random()
        pac = 0.0
        ishell = len(shells) - 1
        for i in range(len(shells) - 1):
            if i in rn:
                pac += shells[i][0] * rn[i]
                if pac > target:
                    ishell = i
                    break
        t = rng.random() * rn[ishell]
        j0 = shells[ishell][2]
        if t < 0.5:
            pzomc = (0.70710678118654502 - np.sqrt(0.5 - np.log(t + t))) / (
                j0 * 1.4142135623731
            )
        else:
            pzomc = (np.sqrt(0.5 - np.log(2 - 2 * t)) - 0.70710678118654502) / (
                j0 * 1.4142135623731
            )
        if pzomc < -1.0:
            continue
        xqc = 1 + tau * (tau - 2 * costh)
        if xqc > 1e-20:
            af = np.sqrt(xqc) * (tau * (tau - costh) / xqc + 1)
        else:
            af = 0.002
        fpzmax = 1 + af * 0.2 if af > 0 else 1 - af * 0.2
        fpz = 1 + af * max(min(pzomc, 0.2), -0.2)
        if rng.random() * fpzmax < fpz:
            break

    t = pzomc * pzomc
    b1 = 1 - t * tau * tau
    b2 = 1 - t * tau * costh
    sign = -1.0 if pzomc < 0 else 1.0
    factor = min((tau / b1) * (b2 + sign * np.sqrt(abs(b2 * b2 - b1 * (1 - t)))), 1.0)
    return energy * factor, costh


def rayleigh_scalar(rng, energy, rita, pmax):
    """rita: dict with x, p, a, b, itl, itu arrays (one material).
    Returns costh."""
    xmax = energy * 8.065535669099010e-5
    x2max = min(xmax * xmax, float(rita["x"][-1]))
    if xmax < 0.01:
        while True:
            costh = 1 - 2 * rng.random()
            if rng.random() <= (costh * costh + 1) * 0.5:
                return costh
    np_r = len(rita["x"])
    while True:
        ru = rng.random() * pmax
        itn = int(ru * (np_r - 1))
        i = int(rita["itl"][itn])
        j = int(rita["itu"][itn])
        while j - i > 1:
            k = (i + j) >> 1
            if ru > rita["p"][k - 1]:
                i = k
            else:
                j = k
        idx = i - 1
        rr = ru - rita["p"][idx]
        if rr > 1e-16:
            d = float(rita["p"][idx + 1] - rita["p"][idx])
            a, b, x = float(rita["a"][idx]), float(rita["b"][idx]), float(rita["x"][idx])
            xx = x + (a + 1 + b) * d * rr / (d * d + (a * d + b * rr) * rr) * (
                float(rita["x"][idx + 1]) - x
            )
        else:
            xx = float(rita["x"][idx])
        if xx < x2max:
            costh = 1 - 2 * xx / x2max
            if rng.random() <= (costh * costh + 1) * 0.5:
                return costh
