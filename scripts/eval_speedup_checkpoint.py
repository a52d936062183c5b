"""Evaluate a speedup checkpoint on a holdout triplet folder.

Round-3 diagnostic for the round-2 speedup failure (VERDICT: evaluate the
pretrain-only checkpoint first to isolate whether the L1 phase or the NLL
phase diverges). Prints per-view and mean PSNR gain and writes a JSON
report next to the checkpoint.

Usage:
    python scripts/eval_speedup_checkpoint.py --ckpt runs/speedup/train/step_800.ckpt \
        --holdout runs/speedup/holdout [--limit 10]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--ckpt", type=click.Path(path_type=Path), required=True)
@click.option("--holdout", "holdout_dir", type=click.Path(path_type=Path),
              required=True)
@click.option("--limit", type=int, default=None,
              help="evaluate only the first N holdout views")
@click.option("--cpu", is_flag=True, help="pin to CPU")
def main(ckpt, holdout_dir, limit, cpu):
    import json

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import numpy as np

    from cbctmc_tpu.models.speedup_inference import MCSpeedup

    holdout_dir = Path(holdout_dir)
    stems = sorted(p.name[:-8] for p in holdout_dir.glob("*_low.npy"))
    if limit:
        stems = stems[:limit]

    example = np.load(holdout_dir / f"{stems[0]}_low.npy")
    speedup = MCSpeedup.from_checkpoint(ckpt, example_shape=(1, *example.shape))

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return 10.0 * np.log10(float(b.max()) ** 2 / max(mse, 1e-30))

    report, gains = {}, []
    for stem in stems:
        lo = np.load(holdout_dir / f"{stem}_low.npy")
        hi = np.load(holdout_dir / f"{stem}_high.npy")
        fp = np.load(holdout_dir / f"{stem}_fp.npy")
        mean, _ = speedup.predict(lo[None], fp[None])
        p_low, p_den = psnr(lo, hi), psnr(mean[0], hi)
        report[stem] = {"psnr_low": p_low, "psnr_denoised": p_den}
        gains.append(p_den - p_low)
        print(f"{stem}: low={p_low:.2f} dB denoised={p_den:.2f} dB "
              f"gain={p_den - p_low:+.2f}", flush=True)
    report["mean_psnr_gain_db"] = float(np.mean(gains))
    out = ckpt.with_suffix(".eval.json")
    out.write_text(json.dumps(report, indent=2))
    print(f"mean gain {report['mean_psnr_gain_db']:+.2f} dB -> {out}")


if __name__ == "__main__":
    main()
