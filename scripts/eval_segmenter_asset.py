"""Held-out Dice evaluation (and stamping) of the packaged segmenter asset.

The packaged default segmenter was trained on synthetic CTs with seeds
1000..1011 (scripts/generate_synthetic_ct.py via train_segmenter_synthetic).
This script evaluates it on FRESHLY GENERATED anatomies (disjoint seeds) —
genuinely unseen draws from the same generative distribution — and writes
the ``default.eval.json`` quality stamp next to the asset via the
publication gate (models/checkpoints.py). Repo policy: assets without a
passing stamp are not auto-defaulted by the CLI.

Usage:
    python scripts/eval_segmenter_asset.py [--n-volumes 3] [--min-dice 0.5]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--n-volumes", type=int, default=3)
@click.option("--seed0", type=int, default=9000,
              help="first generator seed (training used 1000+)")
@click.option("--min-dice", type=float, default=0.5)
@click.option("--output-dir", type=click.Path(path_type=Path),
              default=Path("runs/segmenter_eval"))
@click.option("--cpu/--no-cpu", default=False)
def main(n_volumes, seed0, min_dice, output_dir, cpu):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    import numpy as np

    from generate_synthetic_ct import generate_case
    from cbctmc_tpu.models.checkpoints import load_params, publish_weights
    from cbctmc_tpu.models.segmentation import (
        LABELS, MCSegmenter, N_SOFTMAX_LABELS, default_segmenter_model,
    )

    assert seed0 >= 2000, "evaluation seeds must be disjoint from training"
    asset_dir = Path(__file__).parent.parent / "cbctmc_tpu/assets/models/segmenter"
    ckpt = asset_dir / "default.ckpt"

    model = default_segmenter_model()
    template = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 32, 1), np.float32)
    )["params"]
    params = load_params(template, ckpt)
    segmenter = MCSegmenter(
        model=model, params=params, patch_shape=(64, 64, 64),
        patch_overlap=0.25,
    )

    report = {
        "checkpoint": str(ckpt),
        "eval_seeds": [seed0 + i for i in range(n_volumes)],
        "training_seeds": "1000..1011 (disjoint)",
        "per_volume": [],
    }
    dices = []
    for i in range(n_volumes):
        image, labels = generate_case(seed=seed0 + i)
        pred, _ = segmenter.segment(image)
        pred = pred[:, : image.shape[0], : image.shape[1], : image.shape[2]]
        vol = {}
        for li, name in LABELS.items():
            p = pred[li] > 0.5
            g = labels[li] > 0.5
            denom = p.sum() + g.sum()
            dice = float(2.0 * np.logical_and(p, g).sum() / denom) \
                if denom else 1.0
            vol[name] = dice
            if li > 0 and li != N_SOFTMAX_LABELS - 1:  # foreground, not "other"
                dices.append(dice)
        report["per_volume"].append(vol)
        print(f"volume seed {seed0 + i}: " + ", ".join(
            f"{k}={v:.3f}" for k, v in vol.items()), flush=True)

    report["mean_foreground_dice"] = float(np.mean(dices))
    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / "segmenter_eval.json").write_text(
        json.dumps(report, indent=2))
    print("mean foreground Dice:", report["mean_foreground_dice"], flush=True)

    publish_weights(
        ckpt, asset_dir, report,
        lambda r: (
            r["mean_foreground_dice"] >= min_dice,
            f"mean unseen-synthetic foreground Dice "
            f"{r['mean_foreground_dice']:.3f} (gate: >= {min_dice})",
        ),
    )


if __name__ == "__main__":
    main()
