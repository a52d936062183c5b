"""FlexUNet: a generic n-dimensional U-Net in flax.

Functional re-design of the reference's torch FlexUNet
(cbctmc/speedup/models.py:476-634) — the shared backbone of both the CT
tissue segmenter (3D) and the projection-denoising speedup model (2D):

- init conv -> n_levels x encoder (downsample, then 2x[conv-norm-LeakyReLU])
- -> n_levels x decoder (2x upsample, skip concat, 2x[conv-norm-LeakyReLU])
- -> final conv.

Channels follow either ``filter_base * 2**level`` or an explicit
``n_filters`` list with the reference's layout [init, *enc, *dec, final].
Data layout is channels-last ([B, *spatial, C]) as is idiomatic on TPU;
normalisation is InstanceNorm (non-affine), matching torch's default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Non-affine instance normalisation over the spatial axes."""
    axes = tuple(range(1, x.ndim - 1))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsampling of the spatial axes."""
    for axis in range(1, x.ndim - 1):
        x = jnp.repeat(x, factor, axis=axis)
    return x


def _downsample_max(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Max pooling with window = stride = factor."""
    ndim_sp = x.ndim - 2
    window = (1,) + (factor,) * ndim_sp + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, window, "VALID"
    )


class ConvNormAct(nn.Module):
    features: int
    ndim: int
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=(3,) * self.ndim,
            padding="SAME",
            use_bias=True,
        )(x)
        x = instance_norm(x)
        return nn.leaky_relu(x, self.negative_slope)


class EncoderBlock(nn.Module):
    features: int
    ndim: int
    n_convolutions: int = 2

    @nn.compact
    def __call__(self, x):
        x = _downsample_max(x)
        for _ in range(self.n_convolutions):
            x = ConvNormAct(self.features, self.ndim)(x)
        return x


class DecoderBlock(nn.Module):
    features: int
    ndim: int
    n_convolutions: int = 2

    @nn.compact
    def __call__(self, x, skip):
        x = _upsample(x)
        if skip is not None:
            x = jnp.concatenate([skip, x], axis=-1)
        for _ in range(self.n_convolutions):
            x = ConvNormAct(self.features, self.ndim)(x)
        return x


class FlexUNet(nn.Module):
    """n-D U-Net; input [B, *spatial, n_channels], spatial dims must be
    divisible by 2**n_levels."""

    n_classes: int = 1
    n_levels: int = 4
    ndim: int = 3
    filter_base: Optional[int] = None
    n_filters: Optional[Sequence[int]] = None
    skip_connections: bool = True
    return_bottleneck: bool = False

    def _filters(self):
        if bool(self.filter_base) == bool(self.n_filters):
            raise ValueError("Set exactly one of filter_base / n_filters")
        if self.filter_base:
            return {
                "init": self.filter_base,
                "enc": [self.filter_base * 2**i for i in range(self.n_levels)],
                "dec": [
                    self.filter_base * 2**i
                    for i in reversed(range(self.n_levels))
                ],
                "final": self.filter_base,
            }
        f = list(self.n_filters)
        return {
            "init": f[0],
            "enc": f[1 : self.n_levels + 1],
            "dec": f[self.n_levels + 1 : -1],
            "final": f[-1],
        }

    @nn.compact
    def __call__(self, x):
        f = self._filters()
        x = nn.Conv(f["init"], (3,) * self.ndim, padding="SAME")(x)

        skips = [x]
        for level in range(self.n_levels):
            x = EncoderBlock(f["enc"][level], self.ndim, name=f"enc_{level}")(x)
            skips.append(x)
        bottleneck = x

        for i, level in enumerate(reversed(range(self.n_levels))):
            skip = skips[level] if self.skip_connections else None
            x = DecoderBlock(f["dec"][i], self.ndim, name=f"dec_{level}")(x, skip)

        x = nn.Conv(self.n_classes, (3,) * self.ndim, padding="SAME")(x)
        if self.return_bottleneck:
            return x, bottleneck
        return x
