"""Native (C++) runtime components, loaded through ctypes.

Build: ``python -m cbctmc_tpu.native.build`` (or the Makefile target); the
shared library is cached next to this package. Every entry point has a
numpy fallback so the framework works without the native build.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).parent / "libcbctmc_interchange.so"
_SRC_PATH = Path(__file__).parent / "interchange.cpp"
_lib = None


def build_native(force: bool = False) -> Path:
    """Compile the native library with g++ (no external deps)."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC_PATH), "-o", str(_LIB_PATH),
    ]
    logger.info("Building native interchange library: %s", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not _LIB_PATH.exists():
            build_native()
        lib = ctypes.CDLL(str(_LIB_PATH))
    except Exception as exc:  # toolchain missing: numpy fallbacks take over
        logger.warning("Native interchange unavailable (%s); using numpy", exc)
        _lib = False
        return _lib

    lib.render_vox_lines.restype = ctypes.c_int64
    lib.render_vox_lines.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_char_p,
    ]
    lib.parse_ascii_floats.restype = ctypes.c_int64
    lib.parse_ascii_floats.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.accumulate_fixed_point.restype = None
    lib.accumulate_fixed_point.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def render_vox_lines(materials: np.ndarray, densities: np.ndarray) -> str:
    """Render penEasy "material density" lines (flat input order)."""
    materials = np.ascontiguousarray(materials.reshape(-1), np.uint8)
    densities = np.ascontiguousarray(densities.reshape(-1), np.float32)
    lib = _load()
    if not lib:
        lines = np.char.add(
            np.char.add(materials.astype("U3"), " "),
            np.char.mod("%.6f", densities.astype(np.float64)),
        )
        return "\n".join(lines.tolist()) + "\n"

    n = len(materials)
    out = ctypes.create_string_buffer(n * 16 + 1)
    written = lib.render_vox_lines(
        materials.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        densities.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        out,
    )
    return out.raw[:written].decode()


def parse_ascii_floats(text: str | bytes, max_count: int) -> np.ndarray:
    """Parse whitespace-separated ASCII floats ('#' comments skipped)."""
    if isinstance(text, str):
        text = text.encode()
    lib = _load()
    if not lib:
        values = []
        for line in text.decode().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            values.extend(float(v) for v in line.split())
        return np.asarray(values[:max_count])

    out = np.empty(max_count, np.float64)
    n = lib.parse_ascii_floats(
        text, len(text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_count,
    )
    return out[:n]


def accumulate_fixed_point(
    energies: np.ndarray,
    pixel_indices: np.ndarray,
    n_pixels: int,
    scale: float = 100.0,
) -> np.ndarray:
    """Deterministic u64-style fixed-point tally accumulation (the
    reference's SCALE_eV scheme) for exact cross-run reproducibility."""
    energies = np.ascontiguousarray(energies.reshape(-1), np.float32)
    pixel_indices = np.ascontiguousarray(pixel_indices.reshape(-1), np.int64)
    image = np.zeros(n_pixels, np.int64)
    lib = _load()
    if not lib:
        valid = (pixel_indices >= 0) & (pixel_indices < n_pixels)
        np.add.at(
            image, pixel_indices[valid],
            (energies[valid] * scale + 0.5).astype(np.int64),
        )
        return image
    lib.accumulate_fixed_point(
        energies.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pixel_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(energies), n_pixels, scale,
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return image
