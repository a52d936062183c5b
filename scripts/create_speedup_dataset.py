"""Create speedup training triplets from finished low/high simulation runs
(reference workflow: scripts/create_speedup_dataset.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click
from pathlib import Path


@click.command()
@click.option("--low-folder", type=click.Path(path_type=Path), required=True)
@click.option("--high-folder", type=click.Path(path_type=Path), required=True)
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--forward-projection", type=click.Path(path_type=Path), default=None)
def main(low_folder, high_folder, output_folder, forward_projection):
    from cbctmc_tpu.models.datasets import create_speedup_dataset_from_simulation

    create_speedup_dataset_from_simulation(
        low_folder, high_folder, output_folder, forward_projection
    )


if __name__ == "__main__":
    main()
