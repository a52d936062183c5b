"""Train the production segmenter on procedurally generated labelled CTs
and publish the weights as the framework's default segmenter asset.

The upstream reference's segmenter weights (assets/models/segmenter/
default.pth) are missing from its repo snapshot; the rebuild regenerates
real weights from synthetic anatomies (scripts/generate_synthetic_ct.py).

Usage:
    python scripts/train_segmenter_synthetic.py --data runs/synthetic_ct \
        --output-dir runs/segmenter --n-steps 800
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--data", "data_dir", type=click.Path(path_type=Path), required=True)
@click.option("--output-dir", type=click.Path(path_type=Path), required=True)
@click.option("--n-steps", type=int, default=800)
@click.option("--patch-shape", type=(int, int, int), default=(64, 64, 64))
@click.option("--batch-size", type=int, default=1)
@click.option("--learning-rate", type=float, default=3e-4)
@click.option("--publish/--no-publish", default=True,
              help="copy the final checkpoint into the package assets")
def main(data_dir, output_dir, n_steps, patch_shape, batch_size,
         learning_rate, publish):
    import jax
    import numpy as np

    from cbctmc_tpu.models.datasets import SegmentationPatchDataset
    from cbctmc_tpu.models.segmentation import default_segmenter_model
    from cbctmc_tpu.models.training import SegmentationTrainer

    data_dir = Path(data_dir)
    images = [np.load(p) for p in sorted(data_dir.glob("image_*.npy"))]
    labels = [np.load(p) for p in sorted(data_dir.glob("labels_*.npy"))]
    print(f"{len(images)} training volumes", flush=True)

    model = default_segmenter_model()
    trainer = SegmentationTrainer(
        model, learning_rate=learning_rate, output_dir=Path(output_dir),
        checkpoint_every=200, log_every=25,
    )
    dataset = SegmentationPatchDataset(
        images=images, labels=labels, patch_shape=tuple(patch_shape),
        batch_size=batch_size,
    )
    batches = iter(dataset)
    state = trainer.init(jax.random.PRNGKey(0), next(batches))

    t0 = time.monotonic()

    def progress(step, loss):
        if step % 25 == 0:
            print(f"step {step}: loss={loss:.4f} "
                  f"({(time.monotonic() - t0) / max(step, 1):.1f} s/step)",
                  flush=True)

    state = trainer.fit(state, batches, n_steps=n_steps, callback=progress)

    if publish:
        import shutil

        asset_dir = Path(__file__).parent.parent / (
            "cbctmc_tpu/assets/models/segmenter"
        )
        asset_dir.mkdir(parents=True, exist_ok=True)
        shutil.copy(Path(output_dir) / "final.ckpt", asset_dir / "default.ckpt")
        print("published", asset_dir / "default.ckpt", flush=True)


if __name__ == "__main__":
    main()
