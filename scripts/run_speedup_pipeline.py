"""End-to-end speedup-model pipeline: simulate low/high projection pairs on
phantom scenes, build the training triplets, train the mean/variance UNet
(L1 pretraining then Gaussian NLL, the reference's two-phase schedule), and
evaluate PSNR(denoised, high) vs PSNR(low, high) on held-out projections.

The reference's operating points are low=5e7 / high=2.4e9 photons
(cbctmc/speedup/constants.py:4-5); this pipeline keeps the low point and
scales the high point down (default 4e8) so the dataset generation fits a
single-chip compute budget - the net trains on a per-projection
mean-normalised scale, so the high-point statistics only set the target's
residual noise floor.

Usage (TPU):
    python scripts/run_speedup_pipeline.py --output-folder runs/speedup \
        --n-views 16 --n-low 5e7 --n-high 4e8
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-views", type=int, default=16, help="views per scene")
@click.option("--n-low", type=float, default=5e7)
@click.option("--n-high", type=float, default=4e8)
@click.option("--n-lanes", type=int, default=None,
              help="override the sweep-winner lane count")
@click.option("--train-steps", type=int, default=1200)
@click.option("--pretrain-steps", type=int, default=600)
@click.option("--batch-size", type=int, default=4)
@click.option("--patch", type=int, default=256)
@click.option("--publish/--no-publish", default=True)
@click.option("--skip-simulation", is_flag=True)
def main(output_folder, n_views, n_low, n_high, n_lanes, train_steps,
         pretrain_steps, batch_size, patch, publish, skip_simulation):
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.engine.simulate import MCScanner, SimulationParameters
    from cbctmc_tpu.engine.transport import EngineConfig, production_engine_config
    from cbctmc_tpu.geometry.phantoms import (
        CatPhan604Geometry,
        CIRSPhantomGeometry,
    )
    from cbctmc_tpu.models.datasets import (
        SpeedupProjectionDataset,
        create_speedup_training_example,
    )
    from cbctmc_tpu.models.speedup_net import MCSpeedUpNet
    from cbctmc_tpu.models.training import SpeedupTrainer
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry, mc_scan_angles
    from cbctmc_tpu.recon.joseph import project_forward

    output_folder = Path(output_folder)
    triplet_dir = output_folder / "triplets"
    holdout_dir = output_folder / "holdout"
    for d in (output_folder, triplet_dir, holdout_dir):
        d.mkdir(parents=True, exist_ok=True)

    config = production_engine_config(
        **({'n_lanes': n_lanes} if n_lanes else {}))

    scenes = {
        "catphan": CatPhan604Geometry(
            shape=(256, 256, 256), image_spacing=(2.0, 2.0, 2.0)
        ),
        "cirs": CIRSPhantomGeometry.synthetic_thorax().place_insert(),
    }

    if not skip_simulation:
        for name, geometry in scenes.items():
            done = output_folder / f"{name}_done.txt"
            if done.is_file():
                continue
            params = SimulationParameters(
                n_projections=n_views,
                angle_between_projections=360.0 / n_views,
            )
            scanner = MCScanner(
                geometry.materials, geometry.densities, geometry.image_spacing,
                parameters=params, engine_config=config,
            )
            angles = scanner.projection_angles()
            t0 = time.monotonic()
            low, _ = scanner.simulate(n_histories=int(n_low), seed=11,
                                      progress=False)
            high, info = scanner.simulate(n_histories=int(n_high), seed=12,
                                          progress=False)
            print(f"{name}: sims done in {time.monotonic()-t0:.0f}s "
                  f"({info.histories_per_second:.3e} hist/s)", flush=True)

            # forward projection of the density volume (speedup input 2)
            densities = np.ascontiguousarray(
                np.rot90(geometry.densities, k=3, axes=(0, 1))
            )
            spacing = (geometry.image_spacing[1], geometry.image_spacing[0],
                       geometry.image_spacing[2])
            cb = ConeBeamGeometry(
                n_pixels_u=1848, n_pixels_v=768,
                pixel_size_u=717.024 / 1848 , pixel_size_v=297.984 / 768,
                detector_offset_u=0.0,
            )
            fp = project_forward(densities, cb, angles, volume_spacing=spacing,
                                 step_mm=2.0)
            # detector row order: simulated images are [v, u] with v flipped
            # vs the FP convention (cf. cli._forward_project_geometry)
            fp = fp[:, ::-1, :]

            # clear any partial triplets from a crashed earlier run before
            # regenerating — otherwise stale files silently mix into the
            # training glob on rerun
            for d in (triplet_dir, holdout_dir):
                for stale in d.glob(f"{name}_*"):
                    stale.unlink()
            low_total = low.sum(axis=1)
            high_total = high.sum(axis=1)
            for i in range(n_views):
                target = holdout_dir if i % 8 == 7 else triplet_dir
                create_speedup_training_example(
                    low_total[i], high_total[i], fp[i],
                    target, stem=f"{name}_{i:03d}",
                )
            done.write_text("ok")
            print(f"{name}: triplets written", flush=True)

    # ------------------------------------------------------------------
    model = MCSpeedUpNet()
    trainer = SpeedupTrainer(
        model, n_pretrain_steps=pretrain_steps, learning_rate=2e-4,
        output_dir=output_folder / "train", checkpoint_every=400,
        log_every=50,
    )
    dataset = SpeedupProjectionDataset(
        folder=triplet_dir, batch_size=batch_size,
        patch_shape=(patch, patch),
    )
    batches = iter(dataset)
    state = trainer.init(jax.random.PRNGKey(0), next(batches))
    t0 = time.monotonic()
    state = trainer.fit(state, batches, n_steps=train_steps)
    print(f"training done in {time.monotonic()-t0:.0f}s", flush=True)

    # ------------------------------------------------------------------
    # held-out evaluation
    from cbctmc_tpu.models.checkpoints import save_params
    from cbctmc_tpu.models.speedup_inference import MCSpeedup

    ckpt = output_folder / "train" / "final.ckpt"
    save_params(state.params, ckpt)
    speedup = MCSpeedup(model=model, params=state.params)

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        peak = float(b.max())
        return 10.0 * np.log10(peak**2 / max(mse, 1e-30))

    import json

    stems = sorted(p.name[:-8] for p in holdout_dir.glob("*_low.npy"))
    report = {}
    gains = []
    for stem in stems:
        low = np.load(holdout_dir / f"{stem}_low.npy")
        high = np.load(holdout_dir / f"{stem}_high.npy")
        fp = np.load(holdout_dir / f"{stem}_fp.npy")
        mean, _, _ = speedup.execute(low[None], fp[None])
        p_low = psnr(low, high)
        p_den = psnr(mean[0], high)
        report[stem] = {"psnr_low": p_low, "psnr_denoised": p_den}
        gains.append(p_den - p_low)
        print(f"{stem}: PSNR low={p_low:.2f} dB denoised={p_den:.2f} dB",
              flush=True)
    report["mean_psnr_gain_db"] = float(np.mean(gains))
    with open(output_folder / "speedup_eval.json", "w") as f:
        json.dump(report, f, indent=2)
    print("mean PSNR gain:", report["mean_psnr_gain_db"], flush=True)

    if publish:
        from cbctmc_tpu.models.checkpoints import publish_weights

        publish_weights(
            ckpt,
            Path(__file__).parent.parent / "cbctmc_tpu/assets/models/speedup",
            report,
            lambda r: (
                r["mean_psnr_gain_db"] > 0.0,
                f"mean holdout PSNR gain {r['mean_psnr_gain_db']:+.2f} dB "
                "(gate: > 0 dB)",
            ),
        )


if __name__ == "__main__":
    main()
