"""Full-resolution noise fit (round-5: VERDICT item 8).

Round 4's fit-noise record ran on a 4x-binned detector with 40 views and
had to scale its grid to compare with the reference's
n_histories = 11 903 320 312 (fit on the native 0.388 mm grid at 894 views,
reference scripts/fit_noise.py:304-323 + defaults.py:52). Brute-forcing the
native protocol costs ~22 chip-hours per noise sample; this script instead
uses the VALIDATED fast-scan decomposition (deterministic primary +
analytic compound-Poisson noise + measured MC scatter,
pipeline/fast_scan.py) and one exact symmetry: the water phantom is a
centred cylinder, so its primary expectation and its scatter expectation
are identical for every gantry angle. Hence:

  1. ONE deterministic primary view (exact Amanatides-Woo traversal),
  2. a short brute-force MC run (few views x high statistics) whose
     angle-averaged scatter field estimates the scatter expectation
     (also validated against the deterministic primary by superpixel
     z-scores, recorded in the output),
  3. per target history count: compose all 894 views with per-view noise
     draws, air-normalise on the native grid, FDK with the reference WPC,
     CatPhan-position ROI noise stats,
  4. fit std(n) = a/sqrt(n) + c -> best_n = (a / (std_ref - c))^2, both
     water-only and the 11-ROI deviation optimum.

Usage (TPU):
    python scripts/noise_fit_fullres.py --output runs/noise_fit_r5
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output", "output_folder", type=click.Path(path_type=Path),
              required=True)
@click.option("--n-mc-views", type=int, default=16)
@click.option("--mc-histories-per-view", type=float, default=3e8)
@click.option("--n-projections", type=int, default=894)
@click.option("--counts", type=str,
              default="1e9,2e9,4e9,8e9,11903320312,2.4e10")
@click.option("--seed", type=int, default=20260820)
def main(output_folder, n_mc_views, mc_histories_per_view, n_projections,
         counts, seed):
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
    from cbctmc_tpu.engine.simulate import (
        MCScanner,
        SimulationParameters,
        air_normalize,
        crop_half_fan,
    )
    from cbctmc_tpu.geometry.phantoms import WaterPhantomGeometry
    from cbctmc_tpu.pipeline.fast_scan import FastScanConfig, compose_fast_view
    from cbctmc_tpu.pipeline.noise_fit import (
        NOISE_FIT_MATERIALS,
        fit_noise_law,
        variance_deviation,
    )
    from cbctmc_tpu.pipeline.reconstruction import engine_volume_to_mc_frame
    from cbctmc_tpu.physics.reference_values import (
        DEFAULT_WPC_CATPHAN604,
        REFERENCE_ROI_STATS_CATPHAN604_VARIAN,
    )
    from cbctmc_tpu.geometry.phantoms import CatPhan604Geometry
    from cbctmc_tpu.recon.fdk import fdk_reconstruct
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid

    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    t_start = time.monotonic()

    phantom = WaterPhantomGeometry(shape=(500, 500, 150))
    params = SimulationParameters(
        n_projections=n_projections,
        angle_between_projections=360.0 / n_projections,
    )
    scanner = MCScanner(
        phantom.materials, phantom.densities, phantom.image_spacing,
        parameters=params,
    )
    angles = scanner.projection_angles()

    # --- 1. deterministic primary (one view: the scene is rotationally
    # symmetric about the scan axis)
    source, detector = build_scan(scanner.scan_geometry, angles[:1])
    q = SpectrumQuadrature.build(scanner.table_set, scanner.spectrum, 2)
    fractions = photon_fractions(scanner.scan_geometry)
    t0 = time.monotonic()
    mean, var = deterministic_primary(
        scanner.volume, scanner.table_set, scanner.spectrum,
        scanner.scan_geometry, source, detector, projection_index=0,
        fractions=fractions, quadrature=q,
    )
    print(f"deterministic primary: {time.monotonic()-t0:.0f}s", flush=True)

    # --- 2. short MC run for the scatter expectation + validation
    mc_sel = np.linspace(0, n_projections, n_mc_views, endpoint=False)
    mc_angles = angles[mc_sel.astype(int)]
    t0 = time.monotonic()
    mc_imgs, info = scanner.simulate(
        angles_deg=mc_angles, n_histories=int(mc_histories_per_view),
        seed=seed, progress=False,
    )
    print(f"MC scatter run: {n_mc_views} views x "
          f"{mc_histories_per_view:.1e} hist at "
          f"{info.histories_per_second:.3e} hist/s "
          f"({time.monotonic()-t0:.0f}s)", flush=True)
    mc_primary = np.asarray(mc_imgs[:, 0], np.float64)
    mc_total = np.asarray(mc_imgs.sum(axis=1), np.float64)
    scatter_mean = np.maximum(mc_total - mc_primary, 0.0).mean(axis=0)

    # validation: angle-averaged MC primary vs deterministic expectation
    k = 16
    v, u = (mean.shape[0] // k) * k, (mean.shape[1] // k) * k

    def sp(x, red="mean"):
        r = x[:v, :u].reshape(v // k, k, u // k, k)
        return r.mean(axis=(1, 3)) if red == "mean" else r.sum(axis=(1, 3))

    n_eff = n_mc_views * mc_histories_per_view
    sig = np.sqrt(sp(var, "sum") / n_eff) / (k * k)
    z = (sp(mc_primary.mean(axis=0)) - sp(mean)) / np.maximum(sig, 1e-12)
    validation = {
        "primary_total_ratio_mc_over_det":
            float(mc_primary.sum() / (n_mc_views * mean.sum())),
        "superpixel_abs_z_mean": float(np.abs(z).mean()),
        "superpixel_abs_z_max": float(np.abs(z).max()),
    }
    print("validation:", json.dumps(validation), flush=True)

    # --- 3+4. compose scans at each target count, reconstruct, ROI stats
    p = params
    pixel_mm = p.detector_size[0] / p.n_detector_pixels[0]
    a_pix_cm2 = (pixel_mm / 10.0) * (
        p.detector_size[1] / p.n_detector_pixels[1] / 10.0
    )
    geometry = ConeBeamGeometry(
        sad=p.source_to_isocenter_distance,
        sdd=p.source_to_detector_distance,
        n_pixels_u=1024, n_pixels_v=p.n_detector_pixels[1],
        pixel_size_u=pixel_mm,
        pixel_size_v=p.detector_size[1] / p.n_detector_pixels[1],
        detector_offset_u=-159.856,
    )
    grid = VolumeGrid(shape=(250, 250, 60), spacing=(1.0, 1.0, 1.0))

    # noiseless flat field: deterministic primary of the AIR scene (the
    # ~2 m air path attenuates ~2%, so transmission != 1; the reference's
    # flat is a simulated air scan that carries the same attenuation,
    # projection.py:101-122 — and it Gaussian-denoises it, so a noiseless
    # expectation is the correct limit)
    from cbctmc_tpu.geometry.phantoms import AirGeometry

    air_geom = AirGeometry()
    air_scanner = MCScanner(
        air_geom.materials, air_geom.densities, air_geom.image_spacing,
        parameters=SimulationParameters(
            n_projections=1, angle_between_projections=360.0,
        ),
    )
    air_src, air_det = build_scan(air_scanner.scan_geometry, angles[:1])
    air_flat, _ = deterministic_primary(
        air_scanner.volume, air_scanner.table_set, air_scanner.spectrum,
        air_scanner.scan_geometry, air_src, air_det, projection_index=0,
        quadrature=SpectrumQuadrature.build(
            air_scanner.table_set, air_scanner.spectrum, 2
        ),
    )
    air_crop = crop_half_fan(air_flat[None].astype(np.float64))[0]

    count_list = [int(float(c)) for c in counts.split(",")]
    results = {}
    stds_water, devs_11 = [], []
    for n_target in count_list:
        cfg = FastScanConfig(
            n_histories_target=float(n_target), pixel_area_cm2=a_pix_cm2,
        )
        t0 = time.monotonic()
        keys = jax.random.split(
            jax.random.PRNGKey(seed + n_target % 99991), n_projections
        )
        norm = np.empty((n_projections, p.n_detector_pixels[1], 1024),
                        np.float32)
        photons_min = np.inf
        photons_p1 = []
        for i in range(n_projections):
            _, tot = compose_fast_view(
                keys[i], mean, var, mean, mean + scatter_mean, cfg,
            )
            tot_c = crop_half_fan(tot[None].astype(np.float64))[0]
            ph = tot_c * a_pix_cm2 * n_target / 63_140.0
            photons_min = min(photons_min, float(ph.min()))
            photons_p1.append(float(np.percentile(ph, 1)))
            norm[i] = air_normalize(
                tot_c[None], air_crop, denoise_sigma=None
            )[0, ::-1, :]
        t_comp = time.monotonic() - t0
        t0 = time.monotonic()
        volume = fdk_reconstruct(
            norm, geometry, angles, grid=grid,
            water_precorrection=DEFAULT_WPC_CATPHAN604,
        )
        volume = engine_volume_to_mc_frame(volume)
        t_fdk = time.monotonic() - t0
        stats = CatPhan604Geometry.calculate_roi_statistics(
            volume, radius_margin=2.0, height_margin=2.0
        )
        dev = variance_deviation(stats)
        results[str(n_target)] = {
            "water_std": stats["water"]["std"],
            "water_mean": stats["water"]["mean"],
            "deviation_11roi": dev,
            "photons_per_pixel_min": photons_min,
            "photons_per_pixel_p1": float(np.mean(photons_p1)),
            "compose_s": t_comp, "fdk_s": t_fdk,
        }
        stds_water.append(stats["water"]["std"])
        devs_11.append(dev)
        print(f"n={n_target:.3e}: water std {stats['water']['std']:.6f} "
              f"(target {REFERENCE_ROI_STATS_CATPHAN604_VARIAN['water']['std']:.6f}), "
              f"11-ROI dev {dev:.3f}, photons p1 {np.mean(photons_p1):.0f} "
              f"[compose {t_comp:.0f}s, fdk {t_fdk:.0f}s]", flush=True)

    a, c = fit_noise_law(count_list, stds_water)
    target = REFERENCE_ROI_STATS_CATPHAN604_VARIAN["water"]["std"]
    best_water = (a / (target - c)) ** 2 if target > c else None
    best_11 = count_list[int(np.argmin(devs_11))]

    report = {
        "protocol": {
            "n_projections": n_projections,
            "detector_binning": 1,
            "grid_pixel_mm": pixel_mm,
            "method": "fast-scan composition (deterministic primary + "
                      "angle-averaged MC scatter; water symmetry)",
            "n_mc_views": n_mc_views,
            "mc_histories_per_view": mc_histories_per_view,
        },
        "validation": validation,
        "fit_a": float(a), "fit_c": float(c),
        "target_std": float(target),
        "best_n_histories_water": (
            float(best_water) if best_water else None
        ),
        "reference_n_histories": 11_903_320_312,
        "best_n_histories_11roi_grid": int(best_11),
        "samples": results,
        "wall_s": time.monotonic() - t_start,
    }
    with open(output_folder / "noise_fit_r5.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
