"""Speedup-model acceptance at scan scale: denoise a full low-statistics
CatPhan run with the published speedup weights and score the reconstruction
with the same acceptance report as the raw projections.

This is the reference's production use case (run-mc --speedups N +
eval_speedup_catphan.py): simulate at n_histories / N, restore the
reference-statistics noise character with the mean/variance UNet's Gaussian
sample, and reconstruct. The deliverable is the solid-insert MARE and the
per-insert std-vs-Varian ratios of the denoised recon next to the raw one.

Usage (TPU, after run_catphan_simulation + assemble_catphan_parts):
    python scripts/speedup_acceptance.py --folder runs/catphan_r4 \
        --n-histories 1.2e8
"""

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click

ASSET_DIR = Path(__file__).parent.parent / "cbctmc_tpu/assets/models/speedup"


@click.command()
@click.option("--folder", type=click.Path(path_type=Path), required=True,
              help="assembled run folder (images.npy / air.npy / angles)")
@click.option("--checkpoint", type=click.Path(path_type=Path), default=None,
              help="speedup weights (default: the published stamped asset)")
@click.option("--n-histories", type=float, required=True,
              help="histories/view of the run (for the photon-regime audit)")
@click.option("--batch-size", type=int, default=4)
@click.option("--seed", type=int, default=0)
@click.option("--phantom-size", type=int, default=500,
              help="CatPhan grid for the FP guidance (tests use smaller)")
@click.option("--n-low", type=float, default=6e6,
              help="histories/view of the LOW scan fed to the model (the "
                   "training operating point; train_speedup_from_catphan "
                   "maps n_low -> the run's n_histories). 0 = legacy "
                   "behaviour: denoise the run itself (off-distribution)")
@click.option("--skip-acceptance", is_flag=True,
              help="stop after writing the denoised stacks (smoke test)")
def main(folder, checkpoint, n_histories, batch_size, seed, phantom_size,
         n_low, skip_acceptance):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    import numpy as np

    from cbctmc_tpu.models.checkpoints import asset_has_passing_stamp
    from cbctmc_tpu.models.speedup_inference import MCSpeedup
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry
    from cbctmc_tpu.recon.joseph import project_forward
    from cbctmc_tpu.geometry.phantoms import CatPhan604Geometry

    folder = Path(folder)
    if checkpoint is None:
        if not asset_has_passing_stamp(ASSET_DIR):
            raise click.ClickException(
                "no stamped speedup asset; pass --checkpoint")
        checkpoint = ASSET_DIR / "default.ckpt"

    images = np.load(folder / "images.npy")  # [P, 2(primary,total), v, u]
    idx = np.load(folder / "angle_indices.npy")
    n_planned = len(np.load(folder / "order.npy"))
    angles = 270.0 + idx * 360.0 / n_planned
    n_views, _, h, w = images.shape
    print(f"{n_views} views {h}x{w}", flush=True)

    if n_low and n_low > 0:
        # the model's INPUT distribution is the training low point
        # (n_low histories/view); simulate it rather than feeding the
        # reference-statistics run to itself
        low_path = folder / f"images_low_{int(n_low):d}.npy"
        if not low_path.is_file():
            from cbctmc_tpu.engine.simulate import (
                MCScanner,
                SimulationParameters,
            )

            sp_ph = 500.0 / phantom_size
            phantom_low = CatPhan604Geometry(
                shape=(phantom_size,) * 3, image_spacing=(sp_ph,) * 3
            )
            scanner = MCScanner(
                phantom_low.materials, phantom_low.densities,
                phantom_low.image_spacing,
                parameters=SimulationParameters(
                    n_histories=int(n_low), n_projections=n_planned,
                    angle_between_projections=360.0 / n_planned,
                ),
            )
            t0 = time.monotonic()
            low_imgs, info = scanner.simulate(
                angles_deg=angles, seed=seed + 31, progress=False,
            )
            print(f"low scan: {info.histories_per_second:.3e} hist/s "
                  f"({time.monotonic() - t0:.0f}s)", flush=True)
            np.save(low_path, np.stack(
                [low_imgs[:, 0], low_imgs.sum(axis=1)], axis=1
            ).astype(np.float32))
        low_images = np.load(low_path)
        total = low_images[:, 1]
        primary_for_stack = low_images[:, 0]
    else:
        total = images[:, 1]
        primary_for_stack = images[:, 0]

    # forward-projection guidance channel, same protocol as training
    # (train_speedup_from_catphan.py): bin-4 ray march, upsample, flip v
    fp_path = folder / "fp_guidance.npy"
    if not fp_path.is_file():
        sp = 500.0 / phantom_size
        phantom = CatPhan604Geometry(shape=(phantom_size,) * 3,
                                     image_spacing=(sp,) * 3)
        densities = np.ascontiguousarray(
            np.rot90(phantom.densities, k=3, axes=(0, 1)))
        bin_f = 4
        cb = ConeBeamGeometry(
            n_pixels_u=w // bin_f, n_pixels_v=h // bin_f,
            pixel_size_u=717.024 / 1848 * bin_f,
            pixel_size_v=297.984 / 768 * bin_f,
            detector_offset_u=0.0,
        )
        t0 = time.monotonic()
        fp = np.empty((n_views, h // bin_f, w // bin_f), np.float32)
        chunk = 64
        for s in range(0, n_views, chunk):
            fp[s:s + chunk] = np.asarray(project_forward(
                densities, cb, angles[s:s + chunk],
                volume_spacing=(sp,) * 3, step_mm=2.0 * sp))
            print(f"fp {min(s + chunk, n_views)}/{n_views} "
                  f"({time.monotonic() - t0:.0f}s)", flush=True)
        fp = np.repeat(np.repeat(fp, bin_f, axis=1), bin_f, axis=2)
        np.save(fp_path, fp[:, ::-1, :].astype(np.float32))
    fp = np.load(fp_path)

    speedup = MCSpeedup.from_checkpoint(checkpoint,
                                        example_shape=(1, h, w))
    t0 = time.monotonic()
    mean, _, sample = speedup.execute(total, fp, batch_size=batch_size,
                                      seed=seed)
    print(f"speedup inference done ({time.monotonic() - t0:.0f}s)",
          flush=True)

    reports = {}
    for tag, denoised in (("sample", sample), ("mean", mean)):
        out = folder / f"images_speedup_{tag}.npy"
        np.save(out, np.stack(
            [primary_for_stack, np.clip(denoised, 0.0, None)], axis=1
        ).astype(np.float32))
        if skip_acceptance:
            continue
        report_dir = folder / f"report_speedup_{tag}"
        cmd = [
            sys.executable, str(Path(__file__).parent /
                                "catphan_acceptance.py"),
            "--images", str(out), "--air", str(folder / "air.npy"),
            "--output-folder", str(report_dir),
            "--n-histories", str(n_histories),
        ]
        print("->", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)
        with open(report_dir / "catphan_acceptance.json") as f:
            reports[tag] = json.load(f)

    def mare(r):
        return r.get("total_own_wpc", {}).get("mean_absolute_relative_error")

    def mean_std_ratio(r):
        ratios = [v["std_ratio_vs_varian"]
                  for k, v in r.get("total_own_wpc", {}).items()
                  if isinstance(v, dict) and "std_ratio_vs_varian" in v]
        return float(np.mean(ratios)) if ratios else None

    summary = {
        "checkpoint": str(checkpoint),
        "n_histories_per_view": n_histories,
        "n_views": int(n_views),
        "mare_solid": {tag: mare(r) for tag, r in reports.items()},
        "mean_std_ratio_vs_varian": {
            tag: mean_std_ratio(r) for tag, r in reports.items()
        },
    }
    with open(folder / "speedup_acceptance_summary.json", "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps(summary, indent=2, default=float), flush=True)


if __name__ == "__main__":
    main()
