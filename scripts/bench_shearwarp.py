"""Measure the shear-warp MXU projector pair against the gather-marched
Joseph pair at 4D-demo shapes (the ROOSTER data-term operator cost).

Writes runs/bench_shearwarp.json with per-view-op wall times (forced host
readback per call; jax.block_until_ready does not sync on this platform).

Usage (TPU): python scripts/bench_shearwarp.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--n-views", type=int, default=64)
@click.option("--output", type=click.Path(path_type=Path),
              default=Path("runs/bench_shearwarp.json"))
def main(n_views, output):
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid
    from cbctmc_tpu.recon.joseph import project_forward
    from cbctmc_tpu.recon.shearwarp import ShearWarpProjector

    # the 4D demo's recon shapes: grid (180, 180, 80) @ 2 mm, binned
    # half-fan detector 256 x 192 @ 1.552 mm
    grid = VolumeGrid(shape=(180, 180, 80), spacing=(2.0, 2.0, 2.0))
    geom = ConeBeamGeometry(
        sad=1000.0, sdd=1500.0, n_pixels_u=256, n_pixels_v=192,
        pixel_size_u=1.552, pixel_size_v=1.552,
        detector_offset_u=-159.856,
    )
    angles = 270.0 + np.arange(n_views) * 360.0 / n_views
    rng = np.random.default_rng(0)
    vol = rng.normal(0.02, 0.004, grid.shape).astype(np.float32)
    origin = grid.origin_or_centered()

    proj = ShearWarpProjector(grid.shape, origin, grid.spacing, geom, angles)

    def run_sw_forward():
        return np.asarray(proj.forward(vol)).sum()

    def run_sw_pair():
        y = proj.forward(vol)
        return float(np.asarray(proj.transpose(y)).sum())

    # compile + 3 timed reps
    def timeit(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_sw_f = timeit(run_sw_forward)
    t_sw_pair = timeit(run_sw_pair)

    def run_joseph():
        return project_forward(
            vol, geom, angles, volume_spacing=grid.spacing,
            volume_origin=origin, step_mm=1.4,
        ).sum()

    t_j_f = timeit(run_joseph, reps=1)

    report = {
        "shapes": {"grid": list(grid.shape), "detector": [192, 256],
                   "n_views": n_views},
        "shearwarp_forward_s": t_sw_f,
        "shearwarp_forward_ms_per_view": t_sw_f / n_views * 1e3,
        "shearwarp_pair_s": t_sw_pair,
        "shearwarp_pair_ms_per_view": t_sw_pair / n_views * 1e3,
        "joseph_forward_s": t_j_f,
        "joseph_forward_ms_per_view": t_j_f / n_views * 1e3,
        "forward_speedup_vs_joseph": t_j_f / t_sw_f,
    }
    output.parent.mkdir(parents=True, exist_ok=True)
    with open(output, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
