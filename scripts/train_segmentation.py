"""Train the CT tissue segmenter
(reference workflow: scripts/train_segmentation.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click
from pathlib import Path


@click.command()
@click.option("--image", "images", type=click.Path(path_type=Path), multiple=True,
              required=True, help="CT volume(s) (.mha/.nii)")
@click.option("--labels", "label_files", type=click.Path(path_type=Path),
              multiple=True, required=True,
              help="matching one-hot label volumes (.npy, [9, x, y, z])")
@click.option("--output-dir", type=click.Path(path_type=Path), required=True)
@click.option("--n-steps", type=int, default=30_000)
@click.option("--patch-shape", type=(int, int, int), default=(96, 96, 96))
@click.option("--batch-size", type=int, default=1)
@click.option("--learning-rate", type=float, default=1e-4)
def main(images, label_files, output_dir, n_steps, patch_shape, batch_size,
         learning_rate):
    import jax
    import numpy as np

    from cbctmc_tpu.models.datasets import SegmentationPatchDataset
    from cbctmc_tpu.models.segmentation import default_segmenter_model
    from cbctmc_tpu.models.training import SegmentationTrainer
    from cbctmc_tpu.utils.io import read_image

    imgs = [read_image(p)[0] for p in images]
    labs = [np.load(p) for p in label_files]
    model = default_segmenter_model()
    trainer = SegmentationTrainer(
        model, learning_rate=learning_rate, output_dir=output_dir
    )
    dataset = SegmentationPatchDataset(
        images=imgs, labels=labs, patch_shape=patch_shape, batch_size=batch_size
    )
    batches = iter(dataset)
    state = trainer.init(jax.random.PRNGKey(0), next(batches))
    trainer.fit(state, batches, n_steps=n_steps)


if __name__ == "__main__":
    main()
