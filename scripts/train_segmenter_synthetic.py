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
              help="copy the final checkpoint into the package assets "
                   "(gated on held-out Dice)")
@click.option("--n-holdout", type=int, default=2,
              help="volumes held out of training for the Dice eval")
@click.option("--min-dice", type=float, default=0.5,
              help="publication gate: mean held-out foreground Dice")
@click.option("--min-class-dice", type=float, default=0.4,
              help="publication gate: PER-CLASS floor on the held-out mean "
                   "of every foreground label (VERDICT round-4 item 9: the "
                   "mean-only gate let stomach ship at 0.06)")
def main(data_dir, output_dir, n_steps, patch_shape, batch_size,
         learning_rate, publish, n_holdout, min_dice, min_class_dice):
    import jax
    import numpy as np

    from cbctmc_tpu.models.datasets import SegmentationPatchDataset
    from cbctmc_tpu.models.segmentation import default_segmenter_model
    from cbctmc_tpu.models.training import SegmentationTrainer

    data_dir = Path(data_dir)
    images = [np.load(p) for p in sorted(data_dir.glob("image_*.npy"))]
    labels = [np.load(p) for p in sorted(data_dir.glob("labels_*.npy"))]
    # last n_holdout volumes are never seen in training (the reference
    # trainer splits train/test datasets: cbctmc/segmentation/trainer.py)
    holdout_images, holdout_labels = [], []
    if n_holdout > 0 and len(images) > n_holdout:
        holdout_images = images[-n_holdout:]
        holdout_labels = labels[-n_holdout:]
        images, labels = images[:-n_holdout], labels[:-n_holdout]
    print(f"{len(images)} training volumes, {len(holdout_images)} held out",
          flush=True)

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

    # ------------------------------------------------------------------
    # held-out per-label Dice via the production full-volume inference path
    # (patch extract + stitch), mirroring the reference's train/test split
    import json

    from cbctmc_tpu.models.segmentation import (
        LABELS, MCSegmenter, N_SOFTMAX_LABELS,
    )

    report = {"n_steps": n_steps, "n_train": len(images),
              "n_holdout": len(holdout_images), "per_volume": []}
    dices = []
    segmenter = MCSegmenter(
        model=model, params=state.params,
        patch_shape=tuple(patch_shape), patch_overlap=0.25,
    )
    for vi, (img, lab) in enumerate(zip(holdout_images, holdout_labels)):
        pred, _ = segmenter.segment(img)
        pred = pred[:, : img.shape[0], : img.shape[1], : img.shape[2]]
        vol = {}
        for li, name in LABELS.items():
            p = pred[li] > 0.5
            g = lab[li] > 0.5
            denom = p.sum() + g.sum()
            dice = float(2.0 * np.logical_and(p, g).sum() / denom) \
                if denom else 1.0
            vol[name] = dice
            if li > 0 and li != N_SOFTMAX_LABELS - 1:  # fg, skip "other"
                dices.append(dice)
        report["per_volume"].append(vol)
        print(f"holdout {vi}: " + ", ".join(
            f"{k}={v:.3f}" for k, v in vol.items()), flush=True)
    report["mean_foreground_dice"] = float(np.mean(dices)) if dices else 0.0
    # per-class held-out means (for the per-class gate floor)
    per_class = {}
    for li, name in LABELS.items():
        if li == 0 or li == N_SOFTMAX_LABELS - 1:
            continue
        vals = [v[name] for v in report["per_volume"]]
        per_class[name] = float(np.mean(vals)) if vals else 0.0
    report["per_class_mean_dice"] = per_class
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    with open(Path(output_dir) / "segmenter_eval.json", "w") as f:
        json.dump(report, f, indent=2)
    print("mean held-out foreground Dice:", report["mean_foreground_dice"],
          flush=True)

    if publish:
        from cbctmc_tpu.models.checkpoints import publish_weights

        publish_weights(
            Path(output_dir) / "final.ckpt",
            Path(__file__).parent.parent / "cbctmc_tpu/assets/models/segmenter",
            report,
            lambda r: (
                r["mean_foreground_dice"] >= min_dice
                and min(r["per_class_mean_dice"].values()) >= min_class_dice,
                f"mean held-out foreground Dice "
                f"{r['mean_foreground_dice']:.3f} (gate: >= {min_dice}), "
                f"weakest class "
                f"{min(r['per_class_mean_dice'], key=r['per_class_mean_dice'].get)}"
                f"={min(r['per_class_mean_dice'].values()):.3f} "
                f"(gate: >= {min_class_dice})",
            ),
        )


if __name__ == "__main__":
    main()
