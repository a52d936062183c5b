"""Speedup inference: batched denoising of low-photon projection stacks.

Re-design of the reference's MCSpeedup (cbctmc/speedup/inference.py): the
forward-projection channel is normalised by matching its per-projection
mean/std to the low-photon projection, the (mean, variance) prediction is
batched over projections, and the denoised projection is a Gaussian sample.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.models.checkpoints import load_params
from cbctmc_tpu.models.speedup_net import MCSpeedUpNet, sample_projection

logger = logging.getLogger(__name__)

# physical scale constants of the paper's operating points
# (reference: cbctmc/speedup/constants.py)
PIXEL_AREA_CM2 = 0.006024
MEAN_ENERGY_EV = 62889.36670284205
FACTOR_BEAM_HARDENING = 1.09
N_PHOTONS_LOW = 5e7
N_PHOTONS_HIGH = 2.4e9


def match_mean_std(
    forward_projection: jnp.ndarray, low_photon: jnp.ndarray
) -> jnp.ndarray:
    """Normalise the FP channel to the low-photon projection's per-image
    mean/std (reference: inference.py:135-155)."""
    axes = tuple(range(1, forward_projection.ndim))
    fp = forward_projection - forward_projection.mean(axis=axes, keepdims=True)
    fp = fp / (forward_projection.std(axis=axes, keepdims=True) + 1e-12)
    fp = fp * low_photon.std(axis=axes, keepdims=True)
    return fp + low_photon.mean(axis=axes, keepdims=True)


@dataclasses.dataclass
class MCSpeedup:
    model: MCSpeedUpNet
    params: dict

    def __post_init__(self):
        self._apply = jax.jit(
            lambda params, x: self.model.apply({"params": params}, x)
        )

    @classmethod
    def from_checkpoint(cls, filepath, example_shape=(1, 768, 1024)) -> "MCSpeedup":
        model = MCSpeedUpNet()
        h = (example_shape[1] // 16) * 16
        w = (example_shape[2] // 16) * 16
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 2), jnp.float32)
        )["params"]
        return cls(model=model, params=load_params(template, filepath))

    # ------------------------------------------------------------------
    def predict(
        self,
        low_photon: np.ndarray,  # [P, H, W]
        forward_projection: Optional[np.ndarray] = None,
        batch_size: int = 16,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (mean, variance) stacks [P, H, W]."""
        low = np.asarray(low_photon, np.float32)
        p, h, w = low.shape
        # spatial dims must be divisible by the U-Net depth factor
        h16, w16 = (h // 16) * 16, (w // 16) * 16
        pad_h, pad_w = h - h16, w - w16

        means = np.empty_like(low)
        variances = np.empty_like(low)
        for start in range(0, p, batch_size):
            sl = slice(start, min(start + batch_size, p))
            lo = jnp.asarray(low[sl, :h16, :w16])
            # the net is trained on a transmission-like scale: each
            # projection normalised by its low-photon mean
            scale = jnp.maximum(lo.mean(axis=(1, 2), keepdims=True), 1e-12)
            lo = lo / scale
            if forward_projection is not None:
                fp = jnp.asarray(
                    forward_projection[sl, :h16, :w16], jnp.float32
                )
                fp = match_mean_std(fp, lo)
            else:
                fp = lo
            x = jnp.stack([lo, fp], axis=-1)
            out = np.asarray(self._apply(self.params, x))
            scale_np = np.asarray(scale)
            means[sl, :h16, :w16] = out[..., 0] * scale_np
            variances[sl, :h16, :w16] = out[..., 1] * scale_np**2
        if pad_h or pad_w:
            # edges beyond the net's working area keep the input values
            means[:, h16:, :] = low[:, h16:, :]
            means[:, :, w16:] = low[:, :, w16:]
            variances[:, h16:, :] = 0.0
            variances[:, :, w16:] = 0.0
        return means, variances

    def execute(
        self,
        low_photon: np.ndarray,
        forward_projection: Optional[np.ndarray] = None,
        batch_size: int = 16,
        seed: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (mean, variance, sample) stacks [P, H, W]
        (reference: inference.py:103-133, 179)."""
        mean, variance = self.predict(
            low_photon, forward_projection, batch_size=batch_size
        )
        sample = np.asarray(
            sample_projection(
                jax.random.PRNGKey(seed), jnp.asarray(mean), jnp.asarray(variance)
            )
        )
        return mean, variance, sample
