"""Run the line-pair MTF measurement at real statistics (the reference's
run-mc-lp workflow, scripts/run_mc_line_pairs.py) and record the table.

Usage (TPU):
    python scripts/run_mtf.py --output-folder runs/mtf \
        --n-histories 3e7 --n-projections 90
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-histories", type=float, default=3e7)
@click.option("--n-projections", type=int, default=90)
@click.option("--line-gaps", type=float, multiple=True,
              default=(1.0, 2.0, 3.0, 4.0))
@click.option("--n-lanes", type=int, default=1 << 20)
def main(output_folder, n_histories, n_projections, line_gaps, n_lanes):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.engine.transport import EngineConfig
    from cbctmc_tpu.pipeline.mtf_workflow import run_line_pair_simulations

    result = run_line_pair_simulations(
        output_folder,
        line_gaps=tuple(line_gaps),
        n_histories=int(n_histories),
        n_projections=n_projections,
        engine_config=EngineConfig(
            n_lanes=n_lanes, max_virtual_trips=4, event_fraction=0.35
        ),
    )
    print(result, flush=True)


if __name__ == "__main__":
    main()
