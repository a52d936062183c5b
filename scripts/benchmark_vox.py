"""Micro-benchmark of the native voxel-string renderer
(reference workflow: scripts/benchmark_vox.py for the Cython compiler)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import time

import numpy as np

from cbctmc_tpu import native


def main():
    rng = np.random.default_rng(0)
    for n_side in (128, 256):
        mats = rng.integers(1, 23, (n_side,) * 3).astype(np.uint8)
        dens = (rng.random((n_side,) * 3) * 2.7).astype(np.float32)
        t0 = time.monotonic()
        text = native.render_vox_lines(mats, dens)
        dt = time.monotonic() - t0
        print(f"{n_side}^3 = {mats.size/1e6:.1f}M voxels: {dt:.2f}s "
              f"({mats.size/dt/1e6:.1f}M voxels/s), {len(text)/1e6:.0f} MB")


if __name__ == "__main__":
    main()
