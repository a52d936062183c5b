"""Finish a patient-demo run whose reconstruction/eval was cut off.

The round-5 patient demo's run-mc stack (CT -> DL segmentation -> material
mapping -> 45-view MC simulation) completed on TPU in 2785 s, but the
chain's 3000 s timeout killed `run_patient_demo.py` inside the FDK step.
This script completes the remaining work - FDK on the CT grid + per-tissue
scoring - from the artifacts run-mc already wrote (`geometry.pkl.gz`
replaces the re-segmentation the demo script would do), and can run on CPU
so it does not contend with the TPU validation queue.

Usage:
    JAX_PLATFORMS=cpu python scripts/complete_patient_demo.py \
        --output-folder runs/patient_demo
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell exports axon: FORCE cpu

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--seed", type=int, default=500)
@click.option("--n-projections", type=int, default=45)
@click.option("--n-histories", type=float, default=3e7)
def main(output_folder, seed, n_projections, n_histories):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cbctmc_tpu.geometry.mc_geometry import MCGeometry
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.pipeline.reconstruction import reconstruct_3d
    from cbctmc_tpu.utils.io import read_image

    output_folder = Path(output_folder)
    sim_folder = output_folder / "mc" / "ct" / "reference"
    labels = np.load(output_folder / "labels.npy")
    geometry = MCGeometry.load(sim_folder / "geometry.pkl.gz")

    table_set = default_material_set()
    e_idx = int(round((63_140.0 - table_set.e0) / table_set.de))
    mu_per_rho = np.array([
        1.0 / (10.0 * m.mfp_total[e_idx] * m.density)
        for m in table_set.materials
    ], np.float32)
    expected_mu = mu_per_rho[geometry.materials.astype(int) - 1] * \
        geometry.densities.astype(np.float32)

    nx, ny, nz = geometry.image_shape
    t0 = time.monotonic()
    recon_path = reconstruct_3d(
        sim_folder / "projections_total_normalized.mha",
        output_folder=output_folder / "reconstructions",
        dimension=(ny, nz, nx),
        n_projections=n_projections,
    )
    print(f"FDK done in {time.monotonic() - t0:.0f}s "
          f"({os.environ['JAX_PLATFORMS']})", flush=True)
    recon, _ = read_image(recon_path)

    from scipy.ndimage import binary_erosion, zoom

    factors = [
        e / r for e, r in zip(expected_mu.shape, labels.shape[1:])
    ]
    report = {"seed": seed, "n_projections": n_projections,
              "n_histories_per_view": n_histories, "tissues": {}}
    names = ["background", "bones", "muscles", "fat", "liver", "stomach",
             "lung", "other", "lung_vessels"]
    rel_errors = []
    for li, name in enumerate(names):
        if name in ("background", "lung_vessels"):
            continue
        mask = zoom(labels[li], factors, order=0) > 0.5
        mask = binary_erosion(mask, iterations=3)
        if mask.sum() < 500:
            continue
        mu_ref = float(expected_mu[mask].mean())
        mu_rec = float(recon[mask].mean())
        rel = (mu_rec - mu_ref) / mu_ref if mu_ref else None
        report["tissues"][name] = {
            "n_voxels": int(mask.sum()), "expected_mu": mu_ref,
            "recon_mu": mu_rec, "relative_error": rel,
        }
        rel_errors.append(abs(rel))
        print(f"{name:12s} expected {mu_ref:.5f} recon {mu_rec:.5f} "
              f"({rel:+.1%})", flush=True)

    body = zoom(labels[0], factors, order=0) < 0.5
    ncc = float(np.corrcoef(recon[body].ravel(),
                            expected_mu[body].ravel())[0, 1])
    report["mean_absolute_relative_error"] = float(np.mean(rel_errors))
    report["ncc_inside_body"] = ncc
    with open(output_folder / "patient_demo.json", "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in report.items() if k != "tissues"},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
