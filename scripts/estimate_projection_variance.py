"""Estimate per-pixel projection variance from repeated simulations
(reference workflows: scripts/estimate_projection_variance.py,
mean_variance.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--geometry-filepath", type=click.Path(path_type=Path), required=True)
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-runs", type=int, default=10)
@click.option("--n-histories", type=float, default=5e7)
@click.option("--angle", type=float, default=270.0)
def main(geometry_filepath, output_folder, n_runs, n_histories, angle):
    import numpy as np

    from cbctmc_tpu.engine.simulate import MCScanner, SimulationParameters
    from cbctmc_tpu.geometry.mc_geometry import MCGeometry

    geometry = MCGeometry.load(geometry_filepath)
    params = SimulationParameters(n_histories=int(n_histories))
    scanner = MCScanner(
        geometry.materials, geometry.densities, geometry.image_spacing,
        parameters=params,
    )
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)

    # Welford running mean/variance over repeated independent runs
    mean = None
    m2 = None
    for run in range(n_runs):
        images, _ = scanner.simulate(
            angles_deg=[angle], seed=1000 + run, progress=False
        )
        total = images[0].sum(axis=0)
        if mean is None:
            mean = np.zeros_like(total)
            m2 = np.zeros_like(total)
        delta = total - mean
        mean += delta / (run + 1)
        m2 += delta * (total - mean)
        click.echo(f"run {run + 1}/{n_runs}")
    variance = m2 / max(n_runs - 1, 1)
    np.save(output_folder / "projection_mean.npy", mean)
    np.save(output_folder / "projection_variance.npy", variance)
    click.echo(f"mean/variance saved to {output_folder}")


if __name__ == "__main__":
    main()
