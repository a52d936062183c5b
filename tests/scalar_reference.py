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


# ---------------------------------------------------------------------------
# End-to-end scalar transport oracle
# ---------------------------------------------------------------------------
#
# A complete, slow, per-photon numpy implementation of the reference's
# track_particles history loop (docker/mcgpu/MC-GPU_kernel_v1.3.cu:120-384):
# spectrum sampling by direct CDF inversion (not the engine's Walker alias),
# PENMAIN square-field fan-beam source, global-majorant Woodcock delta
# tracking with NO clearance/soft-tier acceleration, cumulative-probability
# interaction branching, the scalar GCOa/RITA samplers above, and the
# detector-plane tally with 4 scatter-separated channels
# (MC-GPU_v1.3.cu:2783-2953 tally semantics).
#
# It shares NOTHING with cbctmc_tpu.engine except the raw material/spectrum
# data and the numpy scan-geometry builder (whose correctness is separately
# pinned against the Joseph forward projector), so statistical agreement of
# the 4-channel image is an independent end-to-end check of the vectorized
# engine - the in-repo substitute for the MC-GPU golden cross-validation
# that needs a CUDA host.

TALLY_MIN_COS_ANGLE = 0.025
EPS_SOURCE = 1.5e-5


class OracleTables:
    """Precomputed per-material curves on the 5 eV energy grid."""

    def __init__(self, table_set, mats_present):
        self.e0 = table_set.e0
        self.de = table_set.de
        self.n_bins = table_set.n_bins
        self.materials = table_set.materials
        self.inv_tot = {}
        self.inv_com = {}
        self.inv_ray = {}
        self.pmax = {}
        self.shells = {}
        self.rita = {}
        for mi in mats_present:
            m = table_set.materials[mi]
            self.inv_tot[mi] = 1.0 / np.asarray(m.mfp_total, np.float64)
            self.inv_com[mi] = 1.0 / np.asarray(m.mfp_compton, np.float64)
            self.inv_ray[mi] = 1.0 / np.asarray(m.mfp_rayleigh, np.float64)
            self.pmax[mi] = np.asarray(m.rayleigh_pmax, np.float64)
            self.shells[mi] = [
                (float(f), float(ui), float(j0))
                for f, ui, j0 in zip(m.shell_f, m.shell_ui, m.shell_j0)
            ]
            self.rita[mi] = {
                "x": m.rita_x, "p": m.rita_p, "a": m.rita_a, "b": m.rita_b,
                "itl": m.rita_itl, "itu": m.rita_itu,
            }
        self.rho_nom = {mi: float(table_set.densities[mi]) for mi in mats_present}

    def interp(self, curve, energy):
        pos = (energy - self.e0) / self.de
        b = int(min(max(pos, 0.0), self.n_bins - 2))
        f = pos - b
        return curve[b] * (1.0 - f) + curve[b + 1] * f


def _rotate_scalar(d, costh, phi):
    """Scalar PENELOPE DIRECT rotation (kernel :1103-1148)."""
    dx, dy, dz = d
    dxy = dx * dx + dy * dy
    norm2 = dxy + dz * dz
    if abs(norm2 - 1.0) > 1e-7:
        inv = 1.0 / np.sqrt(norm2)
        dx, dy, dz = dx * inv, dy * inv, dz * inv
        dxy = dx * dx + dy * dy
    sin2 = max(1.0 - costh * costh, 0.0)
    cosphi, sinphi = np.cos(phi), np.sin(phi)
    if dxy <= 1e-28:
        sdt = np.sqrt(sin2)
        sign = 1.0 if dz >= 0 else -1.0
        return (sign * sdt * cosphi, sdt * sinphi, sign * costh)
    sdt = np.sqrt(sin2 / dxy)
    return (
        dx * costh + sdt * (dx * dz * cosphi - dy * sinphi),
        dy * costh + sdt * (dy * dz * cosphi + dx * sinphi),
        dz * costh - dxy * sdt * cosphi,
    )


def transport_oracle(
    table_set,
    spectrum,
    mats_1based,
    densities,
    voxel_size_cm,
    source,
    detector,
    n_pixels_x,
    n_pixels_z,
    n_histories,
    seed=0,
):
    """Run ``n_histories`` scalar photon histories; returns the detector
    image f64[4, n_pixels_z, n_pixels_x] in deposited eV (same contract as
    transport.run_projection)."""
    rng = np.random.default_rng(seed)
    mats0 = np.asarray(mats_1based, np.int32) - 1
    dens = np.asarray(densities, np.float64)
    nx, ny, nz = mats0.shape
    vx, vy, vz = (float(v) for v in np.broadcast_to(voxel_size_cm, (3,)))
    bbox = (nx * vx, ny * vy, nz * vz)

    present = sorted(set(mats0.reshape(-1).tolist()))
    tabs = OracleTables(table_set, present)

    # global Woodcock majorant curve: max over voxels of den-scaled inv MFP
    max_den = {mi: 0.0 for mi in present}
    flat_m, flat_d = mats0.reshape(-1), dens.reshape(-1)
    for mi in present:
        sel = flat_m == mi
        if sel.any():
            max_den[mi] = float(flat_d[sel].max())
    maj_inv = np.zeros(tabs.n_bins, np.float64)
    for mi in present:
        maj_inv = np.maximum(
            maj_inv, tabs.inv_tot[mi] * (max_den[mi] / tabs.rho_nom[mi])
        )

    # spectrum CDF (direct inversion; independent of the Walker alias)
    p = np.asarray(spectrum.probabilities, np.float64)
    cdf = np.concatenate([[0.0], np.cumsum(p / p.sum())])
    e_edges = np.asarray(spectrum.energies, np.float64)

    spos = np.asarray(source.position, np.float64)
    rot_fan = np.asarray(source.rot_fan, np.float64)
    ct_low = float(source.cos_theta_low)
    d_ct = float(source.d_cos_theta)
    phi_low = float(source.phi_low)
    d_phi = float(source.d_phi)
    max_h = float(source.max_height_at_y1cm)

    dcen = np.asarray(detector.center, np.float64)
    rot_inv = np.asarray(detector.rot_inv, np.float64)
    cmin = np.asarray(detector.corner_min, np.float64)
    ipx = float(detector.inv_pixel_size_x)
    ipz = float(detector.inv_pixel_size_z)
    sdir = np.asarray(detector.source_direction, np.float64)

    image = np.zeros((4, n_pixels_z, n_pixels_x), np.float64)
    e_min = tabs.e0

    def tally(pos, d, energy, scatter):
        cos_angle = d[0] * sdir[0] + d[1] * sdir[1] + d[2] * sdir[2]
        if cos_angle < TALLY_MIN_COS_ANGLE:
            return
        dist = (
            sdir[0] * (dcen[0] - pos[0])
            + sdir[1] * (dcen[1] - pos[1])
            + sdir[2] * (dcen[2] - pos[2])
        ) / cos_angle
        h = (pos[0] + dist * d[0], pos[1] + dist * d[1], pos[2] + dist * d[2])
        rx = rot_inv[0, 0] * h[0] + rot_inv[0, 1] * h[1] + rot_inv[0, 2] * h[2]
        rz = rot_inv[2, 0] * h[0] + rot_inv[2, 1] * h[1] + rot_inv[2, 2] * h[2]
        ix = int(np.floor((rx - cmin[0]) * ipx))
        iz = int(np.floor((rz - cmin[2]) * ipz))
        if 0 <= ix < n_pixels_x and 0 <= iz < n_pixels_z:
            image[scatter, iz, ix] += energy

    for _ in range(n_histories):
        # --- spectrum energy (CDF inversion, uniform within bin) ---------
        u = rng.random()
        b = int(np.searchsorted(cdf, u, side="right")) - 1
        b = min(max(b, 0), len(p) - 1)
        fr = (u - cdf[b]) / max(cdf[b + 1] - cdf[b], 1e-300)
        energy = e_edges[b] + fr * (e_edges[b + 1] - e_edges[b])

        # --- square-field fan direction (kernel :649-667) -----------------
        while True:
            w = ct_low + rng.random() * d_ct
            phi = phi_low + rng.random() * d_phi
            st = np.sqrt(max(1.0 - w * w, 0.0))
            x, y = st * np.cos(phi), st * np.sin(phi)
            if abs(w / (y + 1e-7)) <= max_h:
                break
        d = (
            rot_fan[0, 0] * x + rot_fan[0, 1] * y + rot_fan[0, 2] * w,
            rot_fan[1, 0] * x + rot_fan[1, 1] * y + rot_fan[1, 2] * w,
            rot_fan[2, 0] * x + rot_fan[2, 1] * y + rot_fan[2, 2] * w,
        )

        # --- move to bbox (kernel :714-805) -------------------------------
        pos = [spos[0], spos[1], spos[2]]
        ts = []
        for ax in range(3):
            if d[ax] > EPS_SOURCE:
                ts.append(0.0 if pos[ax] > 0 else EPS_SOURCE - pos[ax] / d[ax])
            elif d[ax] < -EPS_SOURCE:
                ts.append(
                    0.0 if pos[ax] < bbox[ax]
                    else EPS_SOURCE + (bbox[ax] - pos[ax]) / d[ax]
                )
            else:
                ts.append(-1e9)
        t = max(max(ts), 0.0)
        pos = [pos[i] + t * d[i] for i in range(3)]
        if not all(0.0 <= pos[i] <= bbox[i] for i in range(3)):
            continue  # missed the volume entirely: no tally (matches engine)

        scatter = 0
        alive = True
        while alive:
            mfp_w = 1.0 / tabs.interp(maj_inv, energy)
            # Woodcock virtual-event loop (kernel :249-279)
            while True:
                step = -mfp_w * np.log(rng.random())
                pos = [pos[i] + step * d[i] for i in range(3)]
                if not (
                    EPS_SOURCE <= pos[0] <= bbox[0] - EPS_SOURCE
                    and EPS_SOURCE <= pos[1] <= bbox[1] - EPS_SOURCE
                    and EPS_SOURCE <= pos[2] <= bbox[2] - EPS_SOURCE
                ):
                    tally(pos, d, energy, scatter)
                    alive = False
                    break
                ix = min(int(pos[0] / vx), nx - 1)
                iy = min(int(pos[1] / vy), ny - 1)
                iz = min(int(pos[2] / vz), nz - 1)
                mi = int(mats0[ix, iy, iz])
                den = float(dens[ix, iy, iz])
                inv_tot = (
                    tabs.interp(tabs.inv_tot[mi], energy) * den / tabs.rho_nom[mi]
                )
                if rng.random() >= 1.0 - mfp_w * inv_tot:
                    break  # real interaction
            if not alive:
                break

            # --- interaction branch (kernel :287-354) ---------------------
            scale = den / tabs.rho_nom[mi]
            inv_com = tabs.interp(tabs.inv_com[mi], energy) * scale
            inv_ray = tabs.interp(tabs.inv_ray[mi], energy) * scale
            xi = rng.random() * inv_tot
            if xi < inv_com:
                new_e, costh = compton_scalar(rng, energy, tabs.shells[mi])
                energy = new_e
                scatter = 1 if scatter == 0 else 3
                if energy < e_min:
                    break
                d = _rotate_scalar(d, costh, rng.random() * 2.0 * np.pi)
            elif xi < inv_com + inv_ray:
                pos_b = int(min((energy - tabs.e0) / tabs.de + 1, tabs.n_bins - 1))
                pmax = float(tabs.pmax[mi][pos_b])
                costh = rayleigh_scalar(rng, energy, tabs.rita[mi], pmax)
                scatter = 2 if scatter == 0 else 3
                d = _rotate_scalar(d, costh, rng.random() * 2.0 * np.pi)
            else:
                break  # photoelectric absorption

    return image
