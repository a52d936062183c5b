"""Reference-statistics CatPhan acceptance via the fast-scan mode.

Takes the assembled low-statistics MC run (images.npy at n_s histories per
view, e.g. the 894 x 1.2e8 acceptance run), computes the deterministic
primary for every view (engine/primary.py), validates it against the MC
primary channel, composes the fast scan at the reference operating point
(default 1.19e10 histories/view - cbctmc/defaults.py:51), and scores it
with the standard acceptance report. This is the noise-parity measurement
at statistics that would take ~10 chip-days brute force.

Usage (TPU):
    python scripts/fast_scan_acceptance.py --folder runs/catphan_r4 \
        --n-histories-mc 1.2e8 --n-histories-target 11903320312
"""

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-histories-mc", type=float, required=True,
              help="histories/view of the recorded MC run")
@click.option("--n-histories-target", type=float, default=11_903_320_312)
@click.option("--phantom-shape", type=int, default=500)
@click.option("--n-sub", type=int, default=2)
@click.option("--ray-chunk", type=int, default=262_144)
@click.option("--seed", type=int, default=20260819)
@click.option("--scatter-smooth-sigma", type=float, default=8.0)
@click.option("--skip-acceptance", is_flag=True)
@click.option("--uniform-clearance/--no-uniform-clearance", default=True,
              help="repack the volume with word-uniform clearance boxes "
                   "(primary.uniform_clearance_volume): identical images "
                   "(tests/test_primary.py), several-fold fewer gathers "
                   "through the piecewise-constant phantom bulk")
def main(folder, n_histories_mc, n_histories_target, phantom_shape, n_sub,
         ray_chunk, seed, scatter_smooth_sigma, skip_acceptance,
         uniform_clearance):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    import numpy as np

    from cbctmc_tpu.engine.ct import build_scan
    from cbctmc_tpu.engine.primary import (
        SpectrumQuadrature,
        deterministic_primary,
        photon_fractions,
    )
    from cbctmc_tpu.engine.simulate import MCScanner, SimulationParameters
    from cbctmc_tpu.geometry.phantoms import CatPhan604Geometry
    from cbctmc_tpu.pipeline.fast_scan import FastScanConfig, compose_fast_view

    folder = Path(folder)
    images = np.load(folder / "images.npy", mmap_mode="r")  # [P,2,v,u]
    idx = np.load(folder / "angle_indices.npy")
    n_planned = len(np.load(folder / "order.npy"))
    n_views = images.shape[0]

    spacing = 500.0 / phantom_shape
    phantom = CatPhan604Geometry(shape=(phantom_shape,) * 3,
                                 image_spacing=(spacing,) * 3)
    scanner = MCScanner(
        phantom.materials, phantom.densities, phantom.image_spacing,
        parameters=SimulationParameters(
            n_projections=n_planned,
            angle_between_projections=360.0 / n_planned,
        ),
    )
    angles = scanner.projection_angles()[idx]
    source, detector = build_scan(scanner.scan_geometry, angles)

    volume = scanner.volume
    if uniform_clearance:
        from cbctmc_tpu.engine.primary import uniform_clearance_volume

        t0 = time.monotonic()
        volume = uniform_clearance_volume(volume)
        print(f"uniform-clearance repack: {time.monotonic() - t0:.1f}s",
              flush=True)

    q = SpectrumQuadrature.build(scanner.table_set, scanner.spectrum, n_sub)
    fractions = photon_fractions(scanner.scan_geometry)
    p = scanner.parameters
    a_pix = (p.detector_size[0] / p.n_detector_pixels[0] / 10.0) * (
        p.detector_size[1] / p.n_detector_pixels[1] / 10.0
    )
    cfg = FastScanConfig(
        n_histories_target=n_histories_target,
        pixel_area_cm2=a_pix,
        scatter_smooth_sigma_px=scatter_smooth_sigma,
    )

    out_path = folder / "images_fast.npy"
    fast = np.lib.format.open_memmap(
        out_path, mode="w+", dtype=np.float32, shape=images.shape
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), n_views)

    # validation accumulators: MC primary vs deterministic primary
    tot_mc, tot_det = 0.0, 0.0
    z_max, z_sum, z_n = 0.0, 0.0, 0
    t0 = time.monotonic()
    for i in range(n_views):
        mean, var = deterministic_primary(
            volume, scanner.table_set, scanner.spectrum,
            scanner.scan_geometry, source, detector, projection_index=i,
            ray_chunk=ray_chunk, fractions=fractions, quadrature=q,
        )
        mc_p = np.asarray(images[i, 0], np.float32)
        mc_t = np.asarray(images[i, 1], np.float32)
        tot_mc += float(mc_p.sum())
        tot_det += float(mean.sum())
        # 16x16-superpixel z-scores against the predicted MC noise
        k = 16
        v, u = (mean.shape[0] // k) * k, (mean.shape[1] // k) * k

        def sp(x, red="mean"):
            r = x[:v, :u].reshape(v // k, k, u // k, k)
            return r.mean(axis=(1, 3)) if red == "mean" else r.sum(axis=(1, 3))

        sig = np.sqrt(sp(var, "sum") / n_histories_mc) / (k * k)
        # superpixels with zero PREDICTED variance (outside the source
        # aperture) are excluded: the MC boundary pixels carry O(1e-6)
        # residue there and a sigma floor would manufacture astronomical
        # z-scores (this clipped the round-5 first pass; see
        # rescore_fast_scan_validation.py for the masked re-score)
        valid = sig > 1e-20
        z = np.where(valid, (sp(mc_p) - sp(mean)) / np.maximum(sig, 1e-20),
                     0.0)
        z_max = max(z_max, float(np.abs(z).max()))
        z_sum += float(np.abs(z).sum())
        z_n += int(valid.sum())

        fp, ft = compose_fast_view(keys[i], mean, var, mc_p, mc_t, cfg)
        fast[i, 0], fast[i, 1] = fp, ft
        if (i + 1) % 20 == 0 or i == 0:
            el = time.monotonic() - t0
            print(f"primary {i + 1}/{n_views} "
                  f"({el / (i + 1):.1f} s/view, eta "
                  f"{(n_views - i - 1) * el / (i + 1) / 60:.0f} min)  "
                  f"running total MC/det = {tot_mc / max(tot_det, 1e-9):.4f}",
                  flush=True)
        if (i + 1) % 50 == 0:
            # incremental record: a killed run still leaves the measured
            # steady-state s/view and the running validation stats
            with open(folder / "fast_scan_validation_partial.json", "w") as f:
                json.dump({
                    "views_done": int(i + 1),
                    "seconds_per_view": (time.monotonic() - t0) / (i + 1),
                    "primary_total_ratio_mc_over_det":
                        tot_mc / max(tot_det, 1e-9),
                    "superpixel_abs_z_mean": z_sum / max(z_n, 1),
                    "superpixel_abs_z_max": z_max,
                }, f, indent=2)
    fast.flush()

    validation = {
        "n_views": int(n_views),
        "primary_total_ratio_mc_over_det": tot_mc / tot_det,
        "superpixel_abs_z_mean": z_sum / max(z_n, 1),
        "superpixel_abs_z_max": z_max,
        "seconds_per_view": (time.monotonic() - t0) / n_views,
        "n_histories_mc": n_histories_mc,
        "n_histories_target": n_histories_target,
    }
    with open(folder / "fast_scan_validation.json", "w") as f:
        json.dump(validation, f, indent=2)
    print(json.dumps(validation, indent=2), flush=True)

    # fast air scan at the target statistics: deterministic air transmission
    # is ~flat; reuse the recorded MC air (its noise is negligible after the
    # pipeline's Gaussian denoise, and identical for both stacks)
    if skip_acceptance:
        return
    report_dir = folder / "report_fast"
    cmd = [
        sys.executable,
        str(Path(__file__).parent / "catphan_acceptance.py"),
        "--images", str(out_path),
        "--air", str(folder / "air.npy"),
        "--output-folder", str(report_dir),
        "--n-histories", str(n_histories_target),
    ]
    print("->", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
