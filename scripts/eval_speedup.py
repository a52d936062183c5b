"""Evaluate speedup-model projections against a high-photon reference
(reference workflows: scripts/eval_speedup.py, check_matching_fp.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click
from pathlib import Path


@click.command()
@click.option("--denoised", type=click.Path(path_type=Path), required=True)
@click.option("--reference", type=click.Path(path_type=Path), required=True)
@click.option("--low-photon", type=click.Path(path_type=Path), default=None)
def main(denoised, reference, low_photon):
    import json

    from cbctmc_tpu.pipeline.evaluation import evaluate_speedup
    from cbctmc_tpu.pipeline.simulation import _read_projection_stack

    den = _read_projection_stack(denoised)
    ref = _read_projection_stack(reference)
    low = _read_projection_stack(low_photon) if low_photon else None
    click.echo(json.dumps(evaluate_speedup(den, ref, low), indent=2))


if __name__ == "__main__":
    main()
