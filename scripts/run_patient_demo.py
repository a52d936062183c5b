"""Patient-style end-to-end demo: CT image -> DL segmentation -> material
mapping -> 3D MC simulation -> FDK reconstruction -> per-tissue accuracy.

This drives the reference's PRIMARY call stack (run-mc on a patient CT,
scripts/run_mc_simulations.py:245-461) through the real CLI: an unseen
procedurally generated thorax CT (no patient data ships with either repo)
is written to disk, `cbctmc_tpu.cli run-mc` segments it with the stamped
FlexUNet asset, maps materials, simulates, and this script reconstructs on
the CT grid and scores the recon against the expected attenuation volume
mu = rho / rho_nominal / MFP_total(63.14 keV) of the mapped geometry.

Usage (TPU):
    python scripts/run_patient_demo.py --output-folder runs/patient_demo
"""

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--seed", type=int, default=500,
              help="synthetic-anatomy seed (training used 0-11)")
@click.option("--ct-spacing", type=float, default=3.0)
@click.option("--ct-shape", type=(int, int, int), default=(144, 112, 96))
@click.option("--n-projections", type=int, default=45)
@click.option("--n-histories", type=float, default=3e7)
@click.option("--air-n-histories", type=float, default=1e9)
@click.option("--skip-simulation", is_flag=True,
              help="reuse an existing run-mc output (evaluation only)")
def main(output_folder, seed, ct_spacing, ct_shape, n_projections,
         n_histories, air_n_histories, skip_simulation):
    import numpy as np

    sys.path.insert(0, str(Path(__file__).parent))
    from generate_synthetic_ct import generate_case

    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)

    from cbctmc_tpu.utils.io import write_image

    ct_path = output_folder / "ct.mha"
    labels_path = output_folder / "labels.npy"
    if not ct_path.is_file():
        image, labels = generate_case(seed, shape=tuple(ct_shape))
        write_image(image, ct_path, spacing=(ct_spacing,) * 3)
        np.save(labels_path, labels.astype(np.float32))
    labels = np.load(labels_path)

    sim_root = output_folder / "mc"
    sim_folder = sim_root / "ct" / "reference"
    if not skip_simulation:
        cmd = [
            sys.executable, "-m", "cbctmc_tpu.cli", "run-mc",
            "--image-filepath", str(ct_path),
            "--output-folder", str(sim_root),
            "--reference",
            "--reference-n-histories", str(int(n_histories)),
            "--n-projections", str(n_projections),
            "--air-n-histories", str(air_n_histories),
            "--random-seed", "7",
        ]
        print("->", " ".join(cmd), flush=True)
        t0 = time.monotonic()
        subprocess.run(cmd, check=True, cwd=str(Path(__file__).parent.parent))
        print(f"run-mc done ({time.monotonic() - t0:.0f}s)", flush=True)

    # ------------------------------------------------------------------
    # rebuild the geometry exactly as the CLI did (cached segmentation
    # would be better; the demo re-runs the deterministic pipeline) to get
    # the expected attenuation volume on the 1 mm simulation grid
    from cbctmc_tpu.pipeline.patient import geometry_from_ct
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.models.checkpoints import asset_has_passing_stamp

    asset = (Path(__file__).parent.parent /
             "cbctmc_tpu/assets/models/segmenter")
    segw = asset / "default.ckpt" if asset_has_passing_stamp(asset) else None
    geometry = geometry_from_ct(ct_path, segmenter_weights=segw)

    table_set = default_material_set()
    # MFP tables are in cm at nominal density; mu[1/mm] at the Varian scan's
    # 63.14 keV mean energy = rho_voxel / rho_nominal / (10 * MFP_cm)
    e_idx = int(round((63_140.0 - table_set.e0) / table_set.de))
    mu_per_rho = np.array([
        1.0 / (10.0 * m.mfp_total[e_idx] * m.density)
        for m in table_set.materials
    ], np.float32)
    expected_mu = mu_per_rho[geometry.materials.astype(int) - 1] * \
        geometry.densities.astype(np.float32)

    # ------------------------------------------------------------------
    # FDK on the CT grid (MC frame, centred at isocenter)
    from cbctmc_tpu.pipeline.reconstruction import reconstruct_3d
    from cbctmc_tpu.utils.io import read_image

    nx, ny, nz = geometry.image_shape
    # grid (ny, nx, nz): the MC-frame rot90 then lands on (nx, ny, nz)
    recon_path = reconstruct_3d(
        sim_folder / "projections_total_normalized.mha",
        output_folder=output_folder / "reconstructions",
        dimension=(ny, nz, nx),
        n_projections=n_projections,
    )
    recon, _ = read_image(recon_path)

    # ------------------------------------------------------------------
    # per-tissue accuracy: mean recon mu vs mean expected mu inside each
    # (eroded) label mask on the 1 mm grid
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
            continue  # outside body / sub-voxel structures
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

    body = zoom(labels[0], factors, order=0) < 0.5  # non-background
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
