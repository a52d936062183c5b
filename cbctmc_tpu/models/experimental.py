"""Experimental speedup model variants.

Ports of the reference's alternative architectures kept for research parity
(cbctmc/speedup/models.py: ResidualDenseNet2D :18, MCSpeedUpNet :136,
MCSpeedUpNetSeparated :267, DenseNet :637). The production model is
:class:`cbctmc_tpu.models.speedup_net.MCSpeedUpNet`; these exist so speedup
experiments from the reference can be reproduced.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DenseBlockLayer(nn.Module):
    growth_rate: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME")(x)
        y = jax.nn.mish(y)
        return jnp.concatenate([x, y], axis=-1)


class ResidualDenseBlock2D(nn.Module):
    """Densely connected conv block with a local residual fusion
    (reference: speedup/blocks.py ResidualDenseBlock2D)."""

    growth_rate: int = 16
    n_layers: int = 4

    @nn.compact
    def __call__(self, x):
        features_in = x.shape[-1]
        y = x
        for _ in range(self.n_layers):
            y = DenseBlockLayer(self.growth_rate)(y)
        fused = nn.Conv(features_in, (1, 1))(y)  # local feature fusion
        return x + fused


class ResidualDenseNet2D(nn.Module):
    """RDN-style denoiser: shallow feature extraction, N residual dense
    blocks, global fusion + residual."""

    n_blocks: int = 4
    features: int = 32
    growth_rate: int = 16
    out_channels: int = 1

    @nn.compact
    def __call__(self, x):
        shallow = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        y = shallow
        block_outputs = []
        for _ in range(self.n_blocks):
            y = ResidualDenseBlock2D(self.growth_rate)(y)
            block_outputs.append(y)
        fused = nn.Conv(self.features, (1, 1))(
            jnp.concatenate(block_outputs, axis=-1)
        )
        y = fused + shallow  # global residual
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(y)


class MCSpeedUpNetSeparated(nn.Module):
    """Mean and variance predicted by two independent RDNs
    (reference: speedup/models.py:267)."""

    @nn.compact
    def __call__(self, x):
        mean = jax.nn.relu(
            x[..., 0:1] + ResidualDenseNet2D(name="mean_net")(x)
        )
        log_var = ResidualDenseNet2D(name="var_net")(
            jnp.concatenate([x, mean], axis=-1)
        )
        variance = jnp.exp(jnp.clip(log_var, -14.0, 6.0))
        return jnp.concatenate([mean, variance], axis=-1)


class DenseNet2D(nn.Module):
    """Plain DenseNet regression head (reference: speedup/models.py:637)."""

    n_layers: int = 6
    growth_rate: int = 16
    out_channels: int = 1

    @nn.compact
    def __call__(self, x):
        y = x
        for _ in range(self.n_layers):
            y = DenseBlockLayer(self.growth_rate)(y)
        return nn.Conv(self.out_channels, (1, 1))(y)
