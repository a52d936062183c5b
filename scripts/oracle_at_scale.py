"""Oracle agreement at scale (VERDICT round-4 item 10).

Runs the engine-vs-scalar-PENELOPE oracle comparison
(tests/test_oracle_end_to_end.py) on a CatPhan-slice scene at 96^3 voxels
and records channel-level agreement numbers — the closest in-repo
substitute for the <=1% projection-RMSE-vs-MC-GPU claim (reference output
contract: MC-GPU_v1.3.cu:2783-2953). The unit tests run 32-40^3 scenes on
CPU; this record is a one-off hardware run at ~8x the scene volume and
higher statistics.

Usage (TPU):
    python scripts/oracle_at_scale.py \
        --output docs/validation/oracle_at_scale_r5.json
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import click


@click.command()
@click.option("--output", type=click.Path(path_type=Path),
              default=Path("docs/validation/oracle_at_scale_r5.json"))
@click.option("--n-oracle", type=int, default=200_000)
@click.option("--n-engine", type=int, default=4_000_000)
@click.option("--n-pix", type=int, default=48)
@click.option("--seed", type=int, default=5)
def main(output, n_oracle, n_engine, n_pix, seed):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
    from cbctmc_tpu.engine.tables import (
        build_device_tables,
        build_woodcock_table,
    )
    from cbctmc_tpu.engine.transport import (
        EngineConfig,
        make_voxel_volume,
        run_projection,
    )
    from cbctmc_tpu.geometry.phantoms import CatPhan604Geometry
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.physics.spectrum import default_spectrum

    from scalar_reference import transport_oracle

    table_set = default_material_set()
    spectrum = default_spectrum()

    # CatPhan sensitometry slice at 96^3 (2.2 mm voxels = 211 mm cube
    # covering the 200 mm phantom with all inserts)
    phantom = CatPhan604Geometry(shape=(96,) * 3, image_spacing=(2.2,) * 3)
    mats = phantom.materials
    dens = phantom.densities
    vox_cm = (0.22, 0.22, 0.22)
    size_cm = 96 * 0.22

    geometry = ScanGeometry(
        n_pixels_x=n_pix, n_pixels_z=n_pix,
        detector_size_x=40.0, detector_size_z=40.0,
        sdd=90.0, sad=60.0,
        aperture_phi1=-1.0, aperture_phi2=-1.0, aperture_theta=-1.0,
        source_position_0=(size_cm / 2, size_cm / 2 - 60.0, size_cm / 2),
    )
    source, detector = build_scan(geometry, [270.0])

    # --- engine (TPU)
    tables = build_device_tables(table_set, spectrum)
    max_density = np.zeros(table_set.n_materials, np.float32)
    np.maximum.at(max_density, mats.astype(int).reshape(-1) - 1,
                  dens.reshape(-1))
    woodcock = build_woodcock_table(table_set, max_density)
    volume = make_voxel_volume(mats.astype(np.int32) - 1, dens, vox_cm)
    src = jax.tree.map(lambda x: jnp.asarray(x[0]), source)
    det = jax.tree.map(lambda x: jnp.asarray(x[0]), detector)
    t0 = time.monotonic()
    img_e = np.asarray(run_projection(
        tables, woodcock, volume, src, det,
        jnp.int32(n_engine), jax.random.PRNGKey(seed),
        n_pixels_x=n_pix, n_pixels_z=n_pix,
        config=EngineConfig(n_lanes=1 << 16, max_virtual_trips=8),
    ), np.float64)
    t_engine = time.monotonic() - t0
    print(f"engine: {n_engine:.1e} histories in {t_engine:.0f}s", flush=True)

    # --- scalar oracle (CPU)
    src_np = jax.tree.map(lambda x: np.asarray(x[0]), source)
    det_np = jax.tree.map(lambda x: np.asarray(x[0]), detector)
    t0 = time.monotonic()
    img_o = transport_oracle(
        table_set, spectrum, mats, dens, vox_cm, src_np, det_np,
        n_pix, n_pix, n_oracle, seed=seed + 100,
    )
    t_oracle = time.monotonic() - t0
    print(f"oracle: {n_oracle:.1e} histories in {t_oracle:.0f}s", flush=True)

    e = img_e / n_engine
    o = img_o / n_oracle
    channels = ["primary", "compton", "rayleigh", "multi"]
    per_channel = {}
    for i, name in enumerate(channels):
        per_channel[name] = {
            "engine_ev_per_hist": float(e[i].sum()),
            "oracle_ev_per_hist": float(o[i].sum()),
            "relative_difference": float(
                (e[i].sum() - o[i].sum()) / max(o[i].sum(), 1e-30)
            ),
        }

    # spatial agreement of the primary channel on 6x6 superpixels,
    # z-scored against the oracle's counting error
    k = n_pix // 6
    be = e[0].reshape(6, k, 6, k).sum(axis=(1, 3))
    bo = o[0].reshape(6, k, 6, k).sum(axis=(1, 3))
    # oracle block variance ~ (mean energy per count)^2 * counts / n^2:
    # estimate counts from energy / 63.14 keV
    counts_o = bo * n_oracle / 63_140.0
    sigma = bo / np.sqrt(np.maximum(counts_o, 1.0))
    z = (be - bo) / np.maximum(sigma, 1e-30)
    rmse_rel = float(np.sqrt(np.mean((be - bo) ** 2)) / bo.max())

    report = {
        "scene": "CatPhan604 96^3 @ 2.2 mm (all sensitometry inserts)",
        "n_engine": n_engine, "n_oracle": n_oracle,
        "engine_seconds": t_engine, "oracle_seconds": t_oracle,
        "per_channel": per_channel,
        "total_relative_difference": float(
            (e.sum() - o.sum()) / o.sum()
        ),
        "primary_superpixel_rmse_over_peak": rmse_rel,
        "primary_superpixel_abs_z_mean": float(np.abs(z).mean()),
        "primary_superpixel_abs_z_max": float(np.abs(z).max()),
    }
    output.parent.mkdir(parents=True, exist_ok=True)
    with open(output, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
