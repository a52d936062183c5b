"""Fast-scan composition: reference-statistics projections from a
deterministic primary + analytic noise + scaled low-statistics MC scatter.

The brute-force cost of the reference's production operating point
(1.19e10 histories x 894 views, cbctmc/defaults.py:51) is ~10 chip-days at
the round-4 engine throughput. The fast-scan mode reaches the same
projection statistics in hours by splitting the image the way gDRR does
(Jia et al. 2012, arXiv:1204.6367):

  total(n) = primary_mean            (deterministic, engine/primary.py)
           + primary_noise(n)        (compound-Poisson moments, analytic)
           + scatter_mean            (MC at n_s << n, smoothed, unbiased)
           + scatter_noise(n)        (Poisson with an effective scattered-
                                      photon energy)

The MC engine remains the ground truth: the deterministic primary is
validated against the MC primary channel (tests/test_primary.py), and the
scatter mean comes straight from the engine's scatter-separated tally
channels (total - primary), which is an unbiased estimate at any n_s.

Approximations (documented, all second-order at CatPhan conditions):
- scatter noise uses one effective scattered-photon energy
  (default 55 keV ~ the mean Compton-shifted energy of the 125 kVp
  half-fan spectrum) instead of the full scattered spectrum;
- the MC scatter mean is Gaussian-smoothed before scaling (the scatter
  field is low-frequency; smoothing suppresses the n_s-level MC noise that
  would otherwise be scaled by n/n_s into a fixed pattern). The residual
  pattern error is ~1% of the scatter = ~0.1% of the total signal at the
  default settings.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# mean energy deposited per scattered photon [eV]: Compton at ~60 keV mean
# source energy loses 5-20%; Rayleigh loses nothing. Used only for the
# scatter-noise amplitude (a ~10% error here moves the total std by well
# under 1% at CatPhan scatter fractions).
DEFAULT_SCATTER_PHOTON_ENERGY_EV = 55_000.0


@dataclasses.dataclass(frozen=True)
class FastScanConfig:
    n_histories_target: float
    pixel_area_cm2: float
    scatter_smooth_sigma_px: float = 8.0
    scatter_photon_energy_ev: float = DEFAULT_SCATTER_PHOTON_ENERGY_EV


def smooth_scatter(scatter: np.ndarray, sigma_px: float) -> np.ndarray:
    """Gaussian-smooth a scatter image stack [.., z, x] (last two axes)."""
    if sigma_px <= 0:
        return scatter
    from scipy.ndimage import gaussian_filter

    sig = [0.0] * (scatter.ndim - 2) + [sigma_px, sigma_px]
    return gaussian_filter(scatter, sig, mode="nearest")


def compose_fast_view(
    key,
    primary_mean: np.ndarray,  # eV/cm^2/hist (deterministic_primary)
    primary_var: np.ndarray,  # var_per_hist (deterministic_primary)
    mc_primary: np.ndarray,  # MC primary channel at n_s (eV/cm^2/hist)
    mc_total: np.ndarray,  # MC total channel at n_s (eV/cm^2/hist)
    config: FastScanConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """One view's fast (primary, total) at the target history count.

    All images stay in the engine's per-history units, so the composed
    stack drops into the standard post-processing (air normalisation,
    half-fan crop) unchanged."""
    n = float(config.n_histories_target)
    scatter = smooth_scatter(
        np.maximum(np.asarray(mc_total) - np.asarray(mc_primary), 0.0),
        config.scatter_smooth_sigma_px,
    )

    k1, k2 = jax.random.split(key)
    p_std = jnp.sqrt(jnp.asarray(primary_var) / n)
    fast_primary = jnp.maximum(
        jnp.asarray(primary_mean)
        + jax.random.normal(k1, primary_mean.shape, jnp.float32) * p_std,
        0.0,
    )

    # scatter noise: counts ~ Poisson(S * A * n / E_s) each depositing E_s
    # -> var(image) = S * E_s / (A * n)
    s_var = scatter * config.scatter_photon_energy_ev / (
        config.pixel_area_cm2 * n
    )
    s_std = jnp.sqrt(jnp.asarray(s_var, jnp.float32))
    fast_scatter = jnp.maximum(
        jnp.asarray(scatter, jnp.float32)
        + jax.random.normal(k2, scatter.shape, jnp.float32) * s_std,
        0.0,
    )
    fast_total = fast_primary + fast_scatter
    return np.asarray(fast_primary), np.asarray(fast_total)


def compose_fast_scan(
    seed: int,
    primary_means: np.ndarray,  # [P, z, x]
    primary_vars: np.ndarray,  # [P, z, x]
    mc_images: np.ndarray,  # [P, 2(primary,total), z, x] at n_s
    config: FastScanConfig,
    progress_every: int = 100,
) -> np.ndarray:
    """Full-scan composition; returns [P, 2(primary,total), z, x] at the
    target history count."""
    n_views = primary_means.shape[0]
    out = np.empty_like(mc_images, dtype=np.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_views)
    for i in range(n_views):
        p, t = compose_fast_view(
            keys[i], primary_means[i], primary_vars[i],
            mc_images[i, 0], mc_images[i, 1], config,
        )
        out[i, 0], out[i, 1] = p, t
        if progress_every and (i + 1) % progress_every == 0:
            logger.info("fast-scan composition %d/%d", i + 1, n_views)
    return out
