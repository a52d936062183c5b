"""Run the fit-noise calibration to a recorded result.

The reference's calibration (scripts/fit_noise.py:304-323) swept water-
phantom simulations at 894 projections, fitted std(n) = a/sqrt(n) + c in
the reconstruction domain and solved for the count matching the measured
Varian water-ROI noise — yielding the production default n_histories =
11 903 320 312 (cbctmc/defaults.py:52).

This runner performs the same fit on a single TPU chip with a reduced
number of projections; since the FDK noise variance scales like
1/(n_views * n_histories), the calibrated per-projection count is scaled
by (n_views / 894) to report the 894-view equivalent. The A/sqrt(n)
extrapolation below the sampled counts is the same extrapolation the
reference's plot-based fit performs.

Protocol (chosen a priori — lesson of the round-2 acceptance run): the
fit runs on the acceptance record's 4x-binned detector grid and the
sampled counts are sized so the darkest pixels behind the water stay
well above the ~10 photons/pixel Gaussian-regime floor (a CPU smoke run
showed std(n) turns NON-monotone below it: clamped zero-count pixels
make std rise with n, which would silently invert the fit). Every sample
records its measured photons/pixel so the regime is auditable.

Usage (TPU):
    python scripts/run_noise_fit.py --output-folder runs/noise_fit \
        --n-projections 40 --counts 6e7 1.8e8 5.4e8
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-projections", type=int, default=40)
@click.option("--counts", type=float, nargs=3, default=(6e7, 1.8e8, 5.4e8))
@click.option("--phantom-xy", type=int, default=400)
@click.option("--phantom-z", type=int, default=120)
@click.option("--n-lanes", type=int, default=None,
              help="override the sweep-winner lane count")
@click.option("--detector-binning", type=int, default=4)
def main(output_folder, n_projections, counts, phantom_xy, phantom_z,
         n_lanes, detector_binning):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    import numpy as np

    from cbctmc_tpu.engine.transport import EngineConfig, production_engine_config
    from cbctmc_tpu.pipeline.noise_fit import (
        NOISE_FIT_MATERIALS,
        fit_noise_law,
        simulate_and_reconstruct_water,
        variance_deviation,
    )
    from cbctmc_tpu.physics.reference_values import (
        REFERENCE_ROI_STATS_CATPHAN604_VARIAN,
    )

    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    config = production_engine_config(
        **({'n_lanes': n_lanes} if n_lanes else {}))
    target_std = REFERENCE_ROI_STATS_CATPHAN604_VARIAN["water"]["std"]

    stds, results = [], {}
    for i, n in enumerate(int(c) for c in counts):
        stats = simulate_and_reconstruct_water(
            n, n_projections=n_projections,
            phantom_shape=(phantom_xy, phantom_xy, phantom_z),
            seed=1000 + i, engine_config=config,
            detector_binning=detector_binning,
        )
        stds.append(stats["water"]["std"])
        results[n] = stats
        with open(output_folder / "roi_stats.json", "w") as f:
            json.dump(results, f, indent=2, default=float)
        pp = stats["photons_per_pixel"]
        print(f"n={n:.3e} -> water std {stds[-1]:.6e} "
              f"(photons/pixel min {pp['min']:.1f}, p5 {pp['p5']:.1f}, "
              f"median {pp['median']:.1f})", flush=True)

    a, c = fit_noise_law([int(x) for x in counts], stds)
    best_n_at_views = (a / max(target_std - c, 1e-9)) ** 2
    best_n_894 = best_n_at_views * n_projections / 894.0

    # the reference's headline metric: mean relative std deviation over the
    # 11 insert ROIs (fit_noise.py:252-266); solved over per-ROI noise laws
    ref = REFERENCE_ROI_STATS_CATPHAN604_VARIAN
    icounts = [int(x) for x in counts]
    laws = {
        m: fit_noise_law(icounts, [results[n][m]["std"] for n in icounts])
        for m in NOISE_FIT_MATERIALS
    }

    def deviation_at(n_hist):
        return float(np.mean([
            abs((laws[m][0] / np.sqrt(n_hist) + laws[m][1]) - ref[m]["std"])
            / ref[m]["std"] for m in NOISE_FIT_MATERIALS
        ]))

    grid = np.logspace(np.log10(icounts[0] / 4), np.log10(icounts[-1] * 1e3),
                       600)
    best_n_roi = float(grid[int(np.argmin([deviation_at(g) for g in grid]))])
    summary = {
        "fit_a": a,
        "fit_c": c,
        "target_std": target_std,
        "n_projections": n_projections,
        "detector_binning": detector_binning,
        "photons_per_pixel": {
            str(int(n)): results[int(n)]["photons_per_pixel"]
            for n in counts
        },
        "best_n_histories_at_n_projections": float(best_n_at_views),
        "best_n_histories_894_view_equivalent": float(best_n_894),
        "best_n_11roi_at_n_projections": best_n_roi,
        "best_n_11roi_894_view_equivalent": best_n_roi * n_projections / 894.0,
        "deviation_at_best_11roi": deviation_at(best_n_roi),
        "deviation_11roi_per_sample": {
            str(n): variance_deviation(results[n]) for n in icounts
        },
        "reference_value": 11_903_320_312,
        "samples": {str(int(n)): s for n, s in zip(counts, stds)},
    }
    with open(output_folder / "noise_fit.json", "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps(summary, indent=2, default=float), flush=True)


if __name__ == "__main__":
    main()
