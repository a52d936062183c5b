"""Run the line-pair MTF measurement at real statistics (the reference's
run-mc-lp workflow, scripts/run_mc_line_pairs.py) and record the table.

Protocol (chosen a priori): bin-2 detector grid (0.776 mm pixels, ~0.52 mm
at isocenter — still above Nyquist for the 1 mm line gap) and counts sized
so the darkest pixels behind the 200 mm water cylinder collect >~10
photons (measured per gap in mtf.json — below that the log-normalisation
is starvation-biased, see run_noise_fit.py).

Usage (TPU):
    python scripts/run_mtf.py --output-folder runs/mtf \
        --n-histories 1e8 --n-projections 45
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-histories", type=float, default=1e8)
@click.option("--n-projections", type=int, default=45)
@click.option("--line-gaps", type=float, multiple=True,
              default=(1.0, 2.0, 3.0, 4.0))
@click.option("--n-lanes", type=int, default=None,
              help="override the sweep-winner lane count")
@click.option("--detector-binning", type=int, default=2)
def main(output_folder, n_histories, n_projections, line_gaps, n_lanes,
         detector_binning):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.engine.transport import EngineConfig, production_engine_config
    from cbctmc_tpu.pipeline.mtf_workflow import run_line_pair_simulations

    result = run_line_pair_simulations(
        output_folder,
        line_gaps=tuple(line_gaps),
        n_histories=int(n_histories),
        n_projections=n_projections,
        engine_config=production_engine_config(
        **({'n_lanes': n_lanes} if n_lanes else {})),
        detector_binning=detector_binning,
    )
    print(result, flush=True)


if __name__ == "__main__":
    main()
