"""MC <-> forward-projection geometric-agreement study (round-5 deliverable).

The reference calibrated its MC geometry by maximising the agreement of MC
projections with an RTK Joseph forward projection of the same scene
(scripts/test_geometry.py, brute_force_test_geometry*.py,
check_matching_fp.py:24-38 - PSNR/NCC metrics). This script records the
same study for the TPU engine: it takes the simulated CatPhan run, air-
normalises the PRIMARY channel into line integrals, forward-projects the
phantom's mu volume (total attenuation at the 63.14 keV mean energy of the
filtered 125 kVp spectrum) with the ray-marched Joseph projector on the
identical geometry, and reports PSNR/NCC plus a sub-pixel lateral-offset
scan that would expose any residual geometric mis-calibration.

Usage:
    python scripts/mc_fp_agreement.py --folder runs/catphan_r5 \
        [--n-views 12] [--bin-factor 4]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-views", type=int, default=12)
@click.option("--bin-factor", type=int, default=4)
@click.option("--crop-x", type=int, default=1024)
@click.option("--pixel-size", type=float, default=0.388,
              help="must match the simulation detector (0.388 mm)")
@click.option("--detector-offset", type=float, default=-159.856)
@click.option("--phantom-shape", type=int, default=500)
@click.option("--output", type=click.Path(path_type=Path), default=None)
def main(folder, n_views, bin_factor, crop_x, pixel_size, detector_offset,
         phantom_shape, output):
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.analysis.metrics import (
        normalized_cross_correlation,
        psnr,
    )
    from cbctmc_tpu.engine.simulate import air_normalize, crop_half_fan
    from cbctmc_tpu.geometry.phantoms import CatPhan604Geometry
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry
    from cbctmc_tpu.recon.joseph import project_forward

    folder = Path(folder)
    images = np.load(folder / "images.npy", mmap_mode="r")
    air = np.load(folder / "air.npy").astype(np.float64)
    idx_path = folder / "angle_indices.npy"
    order_path = folder / "order.npy"
    n_avail = images.shape[0]
    if idx_path.is_file() and order_path.is_file():
        idx = np.load(idx_path)
        n_planned = len(np.load(order_path))
    else:
        idx = np.arange(n_avail)
        n_planned = n_avail
    all_angles = 270.0 + idx * 360.0 / n_planned

    # evenly spaced subset of the available views
    sel = np.unique(np.linspace(0, n_avail - 1, n_views).astype(int))
    angles = all_angles[sel]

    def bin2d(a, f):
        v, u = a.shape[-2] // f * f, a.shape[-1] // f * f
        a = a[..., :v, :u]
        return a.reshape(*a.shape[:-2], v // f, f, u // f, f).mean(axis=(-3, -1))

    stack = np.asarray(images[sel, 0], np.float64)  # PRIMARY channel
    stack = bin2d(crop_half_fan(stack, crop_x), bin_factor)
    flat = bin2d(crop_half_fan(air[0][None], crop_x)[0], bin_factor)
    mc = air_normalize(stack, flat, denoise_sigma=(2, 2))[
        :, ::-1, :
    ].astype(np.float32)

    # mu volume at the reference mean energy (63.140 keV,
    # cbctmc/mc/reference.py:4-15): voxel mu = rho/rho_nominal / mfp_total(E)
    mats = default_material_set()
    e_bin = int(round((63_140.0 - mats.e0) / mats.de))
    mu_nominal = np.array(
        [10.0 / m.mfp_total[e_bin] for m in mats.materials], np.float32
    )  # 1/mm at nominal density (mfp in cm)
    rho_nominal = mats.densities
    spacing = 500.0 / phantom_shape
    phantom = CatPhan604Geometry(
        shape=(phantom_shape,) * 3, image_spacing=(spacing,) * 3
    )
    midx = phantom.materials.astype(np.int32) - 1  # 1-based numbers
    mu_vol = (
        mu_nominal[midx] * phantom.densities / rho_nominal[midx]
    ).astype(np.float32)

    nu = crop_x // bin_factor
    nv = mc.shape[1]

    def fp_at(offset_px: float, step: float = 0.5) -> np.ndarray:
        geom = ConeBeamGeometry(
            sad=1000.0, sdd=1500.0, n_pixels_u=nu, n_pixels_v=nv,
            pixel_size_u=pixel_size * bin_factor,
            pixel_size_v=pixel_size * bin_factor,
            detector_offset_u=detector_offset
            + offset_px * pixel_size * bin_factor,
        )
        return project_forward(
            mu_vol, geom, angles, volume_spacing=(spacing,) * 3,
            step_mm=step * spacing,
        )

    t0 = time.time()
    fp = fp_at(0.0)
    print(f"FP of {len(angles)} views done in {time.time() - t0:.0f}s",
          flush=True)

    # beam hardening makes the polychromatic MC line integral sub-linear in
    # the monochromatic FP; report both raw metrics and after the affine
    # fit mc ~ a*fp + b*fp^2 (2nd-order WPC-style), like the reference's
    # check_matching_fp compares after its own normalisation chain
    A = np.stack([fp.ravel(), fp.ravel() ** 2], axis=1)
    coef, *_ = np.linalg.lstsq(A, mc.ravel(), rcond=None)
    fp_matched = (A @ coef).reshape(mc.shape).astype(np.float32)

    report = {
        "n_views": int(len(angles)),
        "angles_deg": [float(a) for a in angles],
        "grid_pixel_mm": pixel_size * bin_factor,
        "ncc_raw": float(normalized_cross_correlation(fp, mc)),
        "psnr_raw": float(psnr(fp, mc)),
        "ncc_matched": float(normalized_cross_correlation(fp_matched, mc)),
        "psnr_matched": float(psnr(fp_matched, mc)),
        "beam_hardening_fit": [float(c) for c in coef],
    }

    # persist the core agreement BEFORE the (slow) offset scan so a killed
    # run still leaves the record
    output = output or (folder / "mc_fp_agreement.json")
    with open(output, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)

    # lateral-offset scan: NCC as a function of a detector-u shift; the
    # argmax localises any residual geometric offset (reference:
    # brute_force_test_geometry searched the same axis). Coarser 1-voxel
    # march: NCC ranking is insensitive to the along-ray quadrature and the
    # half-step march costs ~2x
    scan = {"0.0": float(normalized_cross_correlation(
        fp_at(0.0, step=1.0), mc))}
    for off in [-1.0, -0.5, 0.5, 1.0]:
        scan[str(off)] = float(
            normalized_cross_correlation(fp_at(off, step=1.0), mc)
        )
        print(f"offset {off:+.2f} px -> ncc {scan[str(off)]:.6f}", flush=True)
        best = max(scan, key=scan.get)
        report["offset_scan_ncc"] = scan
        report["best_offset_px"] = float(best)
        report["centered_is_best"] = best == "0.0"
        with open(output, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
