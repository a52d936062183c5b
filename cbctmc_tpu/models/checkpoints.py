"""Parameter checkpointing (replaces the reference's torch .pth state dicts,
e.g. assets/models/{segmenter,speedup}/default.pth)."""

from __future__ import annotations

from pathlib import Path

import flax.serialization
import jax


def save_params(params, filepath) -> Path:
    filepath = Path(filepath)
    filepath.parent.mkdir(parents=True, exist_ok=True)
    payload = flax.serialization.to_bytes(jax.device_get(params))
    filepath.write_bytes(payload)
    return filepath


def load_params(template_params, filepath):
    """Load into the structure of template_params (e.g. from model.init)."""
    data = Path(filepath).read_bytes()
    return flax.serialization.from_bytes(template_params, data)
