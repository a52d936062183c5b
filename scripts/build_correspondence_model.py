"""Build a respiratory correspondence model from a 4D CT
(reference workflows: scripts/build_correspondence_model_{cirs,patient}.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click
from pathlib import Path


@click.command()
@click.option("--phase-image", "phase_images", type=click.Path(path_type=Path),
              multiple=True, required=True, help="4D CT phases in order")
@click.option("--lung-mask", "lung_masks", type=click.Path(path_type=Path),
              multiple=True, default=(),
              help="lung masks per phase (for the volume surrogate)")
@click.option("--output-filepath", type=click.Path(path_type=Path), required=True)
@click.option("--reference-phase", type=int, default=2)
def main(phase_images, lung_masks, output_filepath, reference_phase):
    import numpy as np

    from cbctmc_tpu.pipeline.correspondence import CorrespondenceModel
    from cbctmc_tpu.utils.io import read_image

    images = np.stack([read_image(p)[0] for p in phase_images])
    masks = (
        np.stack([read_image(p)[0] for p in lung_masks]) if lung_masks else None
    )
    timepoints = np.linspace(0.0, 5.0, len(images), endpoint=False)
    model = CorrespondenceModel.build_default(
        images=images, masks=masks, timepoints=timepoints,
        reference_phase=reference_phase,
    )
    path = model.save(output_filepath)
    click.echo(str(path))


if __name__ == "__main__":
    main()
