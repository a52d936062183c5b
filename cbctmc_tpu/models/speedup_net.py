"""MC speedup model: denoise low-photon projections to reference quality.

Re-design of the reference's production MCSpeedUpUNet
(cbctmc/speedup/models.py:393-473): input = (low-photon projection,
histogram-matched forward projection), output = (mean, variance) of the
denoised projection:

- mean = relu(low + bound * tanh(mean_unet(x)))   (bounded residual)
- variance = mean * var_bound * sigmoid(var_unet(mean)) + 1e-6

Sampling a denoised projection draws Normal(mean, sqrt(variance))
(reference: speedup/inference.py:179).

Scale note: the reference bounds the residual at +-10 and the variance
scale at 0.1 on its raw eV-scale projections (speedup/models.py:393-473,
O(100) pixel values, so +-10 is a ~10% correction). This pipeline
mean-normalises every projection to O(1) (datasets.SpeedupProjectionDataset
/ speedup_inference.predict), so the equivalent bounds are ~2x the signal
mean for the residual and ~1x for the relative variance: the round-2 run
kept the raw +-10 bound on the normalised scale, which let the L1 phase
run away to a 4x-too-bright output (holdout PSNR -12.5 dB)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cbctmc_tpu.models.flex_unet import FlexUNet

MEAN_RESIDUAL_BOUND = 2.0
VAR_SCALE_BOUND = 1.0
VAR_EPS = 1e-6


class MCSpeedUpNet(nn.Module):
    """Input [B, H, W, 2] (low-photon, forward projection) ->
    output [B, H, W, 2] (mean, variance)."""

    mean_filter_base: int = 64
    mean_levels: int = 4
    var_filter_base: int = 16
    var_levels: int = 2

    @nn.compact
    def __call__(self, x):
        mean_residual = FlexUNet(
            n_classes=1,
            n_levels=self.mean_levels,
            ndim=2,
            filter_base=self.mean_filter_base,
            name="mean_net",
        )(x)
        mean_residual = MEAN_RESIDUAL_BOUND * jnp.tanh(mean_residual)
        mean = jax.nn.relu(x[..., 0:1] + mean_residual)

        var_scale = VAR_SCALE_BOUND * jax.nn.sigmoid(
            FlexUNet(
                n_classes=1,
                n_levels=self.var_levels,
                ndim=2,
                filter_base=self.var_filter_base,
                name="var_net",
            )(mean)
        )
        variance = mean * var_scale + VAR_EPS
        return jnp.concatenate([mean, variance], axis=-1)


def sample_projection(key: jax.Array, mean: jnp.ndarray,
                      variance: jnp.ndarray) -> jnp.ndarray:
    """Draw a stochastic denoised projection Normal(mean, sqrt(var)),
    clipped at zero (energy fluence is non-negative)."""
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    return jnp.maximum(mean + noise * jnp.sqrt(variance), 0.0)
