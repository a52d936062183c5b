"""Full-volume segmenter inference demo: segment a realistic-size
(512 x 512 x 320) synthetic thorax CT with the production patch-extract /
stitch path and feed the result through the material mapper pipeline into
an MC-ready geometry (the reference's MCGeometry.from_image flow,
cbctmc/mc/geometry.py:495-577 + segmentation/segmenter.py:45-102).

Records per-label Dice against the generator's ground-truth labels, the
material composition of the resulting geometry, and stage timings.

Usage (TPU):
    python scripts/segment_full_volume_demo.py \
        --weights runs/segmenter/final.ckpt --output runs/segmenter/full_volume_demo.json
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))  # sibling script imports

import click


@click.command()
@click.option("--weights", type=click.Path(path_type=Path), required=True)
@click.option("--output", type=click.Path(path_type=Path), required=True)
@click.option("--shape", type=(int, int, int), default=(512, 512, 320))
@click.option("--seed", type=int, default=999, help="unseen generator seed")
@click.option("--patch-shape", type=(int, int, int), default=(64, 64, 64))
def main(weights, output, shape, seed, patch_shape):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from generate_synthetic_ct import generate_case

    from cbctmc_tpu.geometry.mappers import MaterialMapperPipeline
    from cbctmc_tpu.models.checkpoints import load_params
    from cbctmc_tpu.models.segmentation import (
        LABELS,
        MCSegmenter,
        default_segmenter_model,
        get_label_index,
    )
    from cbctmc_tpu.physics.materials import default_material_set

    report = {"shape": list(shape), "seed": seed}

    t0 = time.monotonic()
    image, labels = generate_case(seed, shape=tuple(shape))
    report["t_generate_s"] = round(time.monotonic() - t0, 1)
    print(f"generated {shape} CT in {report['t_generate_s']}s", flush=True)

    model = default_segmenter_model()
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    )["params"]
    params = load_params(template, weights)
    segmenter = MCSegmenter(
        model=model, params=params,
        patch_shape=tuple(patch_shape), patch_overlap=0.25,
    )

    t1 = time.monotonic()
    pred, _ = segmenter.segment(image)
    pred = pred[:, : image.shape[0], : image.shape[1], : image.shape[2]]
    report["t_segment_s"] = round(time.monotonic() - t1, 1)
    print(f"segmented in {report['t_segment_s']}s", flush=True)

    dice = {}
    for li, name in LABELS.items():
        p = pred[li] > 0.5
        g = labels[li] > 0.5
        denom = p.sum() + g.sum()
        dice[name] = float(2.0 * np.logical_and(p, g).sum() / denom) \
            if denom else 1.0
    report["dice"] = dice
    print("dice:", {k: round(v, 3) for k, v in dice.items()}, flush=True)

    # material pipeline on the PREDICTED segmentation (the production path)
    t2 = time.monotonic()
    pipeline = MaterialMapperPipeline.create_default_pipeline(
        body_segmentation=pred[get_label_index("background")] == 0,
        bone_segmentation=pred[get_label_index("upper_body_bones")],
        muscle_segmentation=pred[get_label_index("upper_body_muscles")],
        fat_segmentation=pred[get_label_index("upper_body_fat")],
        liver_segmentation=pred[get_label_index("liver")],
        stomach_segmentation=pred[get_label_index("stomach")],
        lung_segmentation=pred[get_label_index("lung")],
        lung_vessel_segmentation=pred[get_label_index("lung_vessels")],
    )
    materials, densities = pipeline.execute(image)
    report["t_materials_s"] = round(time.monotonic() - t2, 1)

    table_set = default_material_set()
    names = {i + 1: m.identifier for i, m in enumerate(table_set.materials)}
    counts = np.bincount(materials.ravel(), minlength=max(names) + 1)
    report["material_fractions"] = {
        names.get(i, f"#{i}"): float(c / materials.size)
        for i, c in enumerate(counts) if c
    }
    report["density_range"] = [float(densities.min()), float(densities.max())]

    fg = [v for k, v in dice.items()
          if k not in ("background", "other")]
    report["mean_foreground_dice"] = float(np.mean(fg))

    output = Path(output)
    output.parent.mkdir(parents=True, exist_ok=True)
    with open(output, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
