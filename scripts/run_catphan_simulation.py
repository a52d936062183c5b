"""Simulate the CatPhan604 scan for the acceptance report.

Produces the raw artifacts (images.npy [P, 4, v, u] in eV/cm^2/history and
air.npy [4, v, u]) that scripts/catphan_acceptance.py post-processes. The
round-2 acceptance configuration simulates the full-resolution wide
detector (1848 x 768 @ 0.388 mm) so the report no longer relies on
detector binning to mask photon starvation.

Usage:
    python scripts/run_catphan_simulation.py --output-folder runs/catphan \
        --n-projections 180 --n-histories 2e8 [--phantom-shape 500]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-projections", type=int, default=180)
@click.option("--n-histories", type=float, default=2e8)
@click.option("--air-histories", type=float, default=2e9)
@click.option("--phantom-shape", type=int, default=500)
@click.option("--phantom-spacing", type=float, default=1.0)
@click.option("--n-lanes", type=int, default=None,
              help="override the sweep-winner lane count")
@click.option("--seed", type=int, default=42)
def main(output_folder, n_projections, n_histories, air_histories,
         phantom_shape, phantom_spacing, n_lanes, seed):
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.engine.simulate import MCScanner, SimulationParameters
    from cbctmc_tpu.engine.transport import EngineConfig, production_engine_config
    from cbctmc_tpu.geometry.phantoms import AirGeometry, CatPhan604Geometry
    from cbctmc_tpu.utils.logging import init_fancy_logging as init_logging

    init_logging()
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)

    config = production_engine_config(
        **({'n_lanes': n_lanes} if n_lanes else {}))
    params = SimulationParameters(
        n_histories=int(n_histories), n_projections=n_projections,
        angle_between_projections=360.0 / n_projections,
    )

    phantom = CatPhan604Geometry(
        shape=(phantom_shape,) * 3, image_spacing=(phantom_spacing,) * 3
    )

    # air (flat-field) scan: one projection, huge box of air
    air_path = output_folder / "air.npy"
    if not air_path.is_file():
        air_geom = AirGeometry()
        air_scanner = MCScanner(
            air_geom.materials, air_geom.densities, air_geom.image_spacing,
            parameters=SimulationParameters(
                n_histories=int(air_histories), n_projections=1,
            ),
            engine_config=config,
        )
        t0 = time.monotonic()
        air_imgs, info = air_scanner.simulate(angles_deg=[270.0], seed=seed + 1)
        print(f"air scan: {info.histories_per_second:.3e} hist/s, "
              f"{time.monotonic() - t0:.0f}s", flush=True)
        # store (primary, total) only: the acceptance report needs no finer
        # scatter split and the full 4-channel stack would be 4 GB
        np.save(air_path, np.stack(
            [air_imgs[0, 0], air_imgs[0].sum(axis=0)]).astype(np.float32))

    scanner = MCScanner(
        phantom.materials, phantom.densities, phantom.image_spacing,
        parameters=params, engine_config=config,
    )
    angles = scanner.projection_angles()
    # interleaved processing order: any prefix of completed chunks covers
    # the full arc quasi-uniformly, so the run can be stopped early and
    # still reconstruct (assemble_catphan_parts reorders by angle)
    stride = 8
    order_path = output_folder / "order.npy"
    if order_path.is_file():
        # resuming: the part files are indexed against the order that was
        # in force when they were written - never recompute it
        order = np.load(order_path)
    else:
        # bit-reversed class sequence: any prefix of stride classes covers
        # the arc as uniformly as possible (0,4,2,6,... instead of 0,1,2,...)
        classes = sorted(range(stride),
                         key=lambda s: int(f"{s:03b}"[::-1], 2))
        order = np.concatenate(
            [np.arange(s0, n_projections, stride) for s0 in classes]
        )
        np.save(order_path, order)
    t0 = time.monotonic()
    chunk = 10  # projections per checkpoint file
    n_done = 0
    for lo in range(0, n_projections, chunk):
        hi = min(lo + chunk, n_projections)
        part = output_folder / f"part_{lo:04d}.npy"
        if part.is_file():
            continue
        sel = order[lo:hi]
        imgs, info = scanner.simulate(
            angles_deg=angles[sel], seed=seed + 100 + lo, progress=False
        )
        np.save(part, np.stack(
            [imgs[:, 0], imgs.sum(axis=1)], axis=1).astype(np.float32))
        n_done += hi - lo
        el = time.monotonic() - t0
        rate = n_done * int(n_histories) / el
        eta = (n_projections - hi) * int(n_histories) / max(rate, 1)
        print(f"projections {hi}/{n_projections}  {rate:.3e} hist/s  "
              f"eta {eta/60:.0f} min", flush=True)

    print("simulation complete", flush=True)


if __name__ == "__main__":
    main()
