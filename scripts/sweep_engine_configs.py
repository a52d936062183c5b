"""Engine-config throughput sweep + kernel census for the best config.

Sweeps EngineConfig knobs (lanes, flights/iteration, resolves, event
budget) on a CatPhan604 scene and prints throughput, flight-slot
utilisation and flights/history per config, then captures a device trace
of the winner. The lane-count axis probes the fixed-dispatch share: every
TPU gather/scatter costs ~0.65 ms dispatch + ~2.4-4.6 ns per lane index
(docs/ROADMAP.md), so doubling lanes amortises the fixed part across
twice the histories if HBM latency doesn't regress.

Usage (TPU):
    python scripts/sweep_engine_configs.py --scene 256
    python scripts/sweep_engine_configs.py --scene full --configs T4 T4_L21
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


def build_configs():
    from cbctmc_tpu.engine.transport import EngineConfig

    L = 1 << 20
    return {
        # ---- engine v4 (resolve-in-place) family ----
        # flights x resolves: R=T resolves after every flight (no pending
        # idle), R<T amortises the resolve's angle-ICDF gather
        "V4_T4_R2": EngineConfig(n_lanes=L, max_virtual_trips=4),
        "V4_T4_R4": EngineConfig(n_lanes=L, max_virtual_trips=4,
                                 n_resolves=4),
        "V4_T4_R1": EngineConfig(n_lanes=L, max_virtual_trips=4,
                                 n_resolves=1),
        "V4_T2_R2": EngineConfig(n_lanes=L, max_virtual_trips=2,
                                 n_resolves=2),
        "V4_T6_R3": EngineConfig(n_lanes=L, max_virtual_trips=6,
                                 n_resolves=3),
        "V4_T8_R4": EngineConfig(n_lanes=L, max_virtual_trips=8,
                                 n_resolves=4),
        "V4_T8_R2": EngineConfig(n_lanes=L, max_virtual_trips=8),
        # lane count
        "V4_T4_R2_L21": EngineConfig(n_lanes=1 << 21, max_virtual_trips=4),
        "V4_T4_R2_L19": EngineConfig(n_lanes=1 << 19, max_virtual_trips=4),
        "V4_T4_R2_L18": EngineConfig(n_lanes=1 << 18, max_virtual_trips=4),
        "V4_T4_R2_L17": EngineConfig(n_lanes=1 << 17, max_virtual_trips=4),
        "V4_T4_R4_L19": EngineConfig(n_lanes=1 << 19, max_virtual_trips=4,
                                     n_resolves=4),
        "V4_T2_R2_L19": EngineConfig(n_lanes=1 << 19, max_virtual_trips=2),
        "V4_T2_R2_L18": EngineConfig(n_lanes=1 << 18, max_virtual_trips=2),
        "V4_T2_R2_L17": EngineConfig(n_lanes=1 << 17, max_virtual_trips=2),
        "V4_T2_R2_L16": EngineConfig(n_lanes=1 << 16, max_virtual_trips=2),
        "V4_T1_R1_L18": EngineConfig(n_lanes=1 << 18, max_virtual_trips=1,
                                     n_resolves=1),
        "V4_T3_R3_L18": EngineConfig(n_lanes=1 << 18, max_virtual_trips=3,
                                     n_resolves=3),
        "V4_T4_R4_L18": EngineConfig(n_lanes=1 << 18, max_virtual_trips=4,
                                     n_resolves=4),
        "V4_T8_R4_L19": EngineConfig(n_lanes=1 << 19, max_virtual_trips=8,
                                     n_resolves=4),
        # fine sweep around the round-4 production point (T2 R2 64k):
        # lane floor, trip/resolve shape and event budget
        "V4_T2_R2_L15": EngineConfig(n_lanes=1 << 15, max_virtual_trips=2),
        "V4_T2_R2_L14": EngineConfig(n_lanes=1 << 14, max_virtual_trips=2),
        "V4_T1_R1_L16": EngineConfig(n_lanes=1 << 16, max_virtual_trips=1,
                                     n_resolves=1),
        "V4_T1_R1_L15": EngineConfig(n_lanes=1 << 15, max_virtual_trips=1,
                                     n_resolves=1),
        "V4_T3_R3_L16": EngineConfig(n_lanes=1 << 16, max_virtual_trips=3,
                                     n_resolves=3),
        "V4_T2_R1_L16": EngineConfig(n_lanes=1 << 16, max_virtual_trips=2,
                                     n_resolves=1),
        "V4_T2_R2_L16_EF25": EngineConfig(n_lanes=1 << 16,
                                          max_virtual_trips=2,
                                          event_fraction=0.25),
        "V4_T2_R2_L16_EF50": EngineConfig(n_lanes=1 << 16,
                                          max_virtual_trips=2,
                                          event_fraction=0.5),
        # component A/Bs at the production point
        "V4_T4_R2_FLATVOX": EngineConfig(n_lanes=L, max_virtual_trips=4,
                                         paired_voxel_gather=False),
        "V4_T4_R2_SIGTAB": EngineConfig(n_lanes=L, max_virtual_trips=4,
                                        sigma_mode="table"),
        "V4_T4_R2_ALIAS": EngineConfig(n_lanes=L, max_virtual_trips=4,
                                       spectrum_mode="alias"),
        "V4_T2_R2_L16_FLATVOX": EngineConfig(
            n_lanes=1 << 16, max_virtual_trips=2, paired_voxel_gather=False),
        "V4_T2_R2_L16_SIGTAB": EngineConfig(
            n_lanes=1 << 16, max_virtual_trips=2, sigma_mode="table"),
        "V4_T2_R2_L16_ALIAS": EngineConfig(
            n_lanes=1 << 16, max_virtual_trips=2, spectrum_mode="alias"),
        "V4_T2_R2_L16_RITA": EngineConfig(
            n_lanes=1 << 16, max_virtual_trips=2, rayleigh_mode="rita"),
        # ---- engine v3.4 reference points (resolve_inplace=False) ----
        "T4": EngineConfig(n_lanes=L, max_virtual_trips=4,
                           event_fraction=0.35, resolve_inplace=False),
        "T6_R3": EngineConfig(n_lanes=L, max_virtual_trips=6,
                              event_fraction=0.35, n_resolves=3,
                              resolve_inplace=False),
        "T8": EngineConfig(n_lanes=L, max_virtual_trips=8,
                           event_fraction=0.35, resolve_inplace=False),
        "T4_L21": EngineConfig(n_lanes=1 << 21, max_virtual_trips=4,
                               event_fraction=0.35, resolve_inplace=False),
    }


@click.command()
@click.option("--scene", type=click.Choice(["smoke", "256", "full"]),
              default="256")
@click.option("--configs", "config_names", multiple=True,
              help="subset of config names; default all")
@click.option("--chunk", type=float, default=5e7)
@click.option("--reps", type=int, default=3)
@click.option("--trace/--no-trace", default=True)
def main(scene, config_names, chunk, reps, trace):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
    from cbctmc_tpu.engine.tables import build_device_tables
    from cbctmc_tpu.engine.transport import make_scene, run_projection
    from cbctmc_tpu.geometry.phantoms import CatPhan604Geometry
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.physics.spectrum import default_spectrum
    from cbctmc_tpu.utils.profiling import capture_trace, kernel_census

    table_set = default_material_set()
    tables = build_device_tables(table_set, default_spectrum())

    if scene == "smoke":
        shape, spacing_mm, n_pix = (64, 64, 64), 4.0, (116, 48)
    elif scene == "256":
        shape, spacing_mm, n_pix = (256, 256, 256), 2.0, (1848, 768)
    else:
        shape, spacing_mm, n_pix = (500, 500, 500), 1.0, (1848, 768)

    print("building phantom...", flush=True)
    phantom = CatPhan604Geometry(shape=shape, image_spacing=(spacing_mm,) * 3)
    mats = np.ascontiguousarray(
        np.rot90(phantom.materials, k=3, axes=(0, 1))).astype(np.int32) - 1
    dens = np.ascontiguousarray(np.rot90(phantom.densities, k=3, axes=(0, 1)))
    volume, woodcock = make_scene(table_set, mats, dens,
                                  (spacing_mm / 10.0,) * 3)

    half = shape[0] * spacing_mm / 2 / 10.0
    geom = ScanGeometry(
        n_pixels_x=n_pix[0], n_pixels_z=n_pix[1],
        detector_size_x=71.7024, detector_size_z=29.7984,
        sdd=150.0, sad=100.0,
        aperture_phi1=1.481720423651376, aperture_phi2=13.441979314886868,
        aperture_theta=-1.0,
        source_position_0=(half, half - 100.0, half),
    )
    source, detector = build_scan(geom, [270.0])
    src = jax.tree.map(lambda x: jnp.asarray(x[0]), source)
    det = jax.tree.map(lambda x: jnp.asarray(x[0]), detector)

    def make_run(config):
        def run(n, seed, stats=False):
            out = run_projection(
                tables, woodcock, volume, src, det,
                jnp.int32(n), jax.random.PRNGKey(seed),
                n_pixels_x=n_pix[0], n_pixels_z=n_pix[1], config=config,
                return_stats=stats,
            )
            # jax.block_until_ready does NOT synchronize on the axon tunnel
            # platform; a tiny-scalar host readback is the reliable fence
            # (the pre-r4 sweeps used block_until_ready and over-reported)
            img = out[0] if stats else out
            np.asarray(jnp.sum(img))
            return out
        return run

    all_configs = build_configs()
    if config_names:
        all_configs = {k: all_configs[k] for k in config_names}
    if scene == "smoke":  # CPU-sized lanes/chunks, same code paths
        import dataclasses

        all_configs = {
            k: dataclasses.replace(v, n_lanes=1 << 14)
            for k, v in all_configs.items()
        }
        chunk = min(chunk, 2e5)

    chunk = int(chunk)
    best, best_tp = None, 0.0
    for name, config in all_configs.items():
        run = make_run(config)
        print(f"=== {name}", flush=True)
        t0 = time.monotonic()
        run(2_000_000, 0)
        print(f"compile+warmup {time.monotonic()-t0:.1f}s", flush=True)
        t0 = time.monotonic()
        for i in range(reps):
            run(chunk, i + 1)
        dt = time.monotonic() - t0
        tp = reps * chunk / dt
        print(f"{name} throughput: {tp:.3e} hist/s ({dt:.1f}s)", flush=True)
        img, extras = run(2 * chunk, 7, stats=True)
        c = np.asarray(extras["counts"])
        iters = int(extras["iterations"])
        T = config.max_virtual_trips
        print(f"  flights/history: {c[7]/(2*chunk):.2f}  utilisation: "
              f"{c[7]/(iters*T*config.n_lanes):.3f}  iters: {iters}",
              flush=True)
        print(f"  tallied energy: {c[8]:.4g} eV  image sum: "
              f"{float(np.asarray(img).sum()):.4g}", flush=True)
        if tp > best_tp:
            best, best_tp = name, tp

    print(f"BEST: {best} {best_tp:.3e}", flush=True)
    if scene != "smoke":
        # record the winner so bench.py (and the driver's round-end bench)
        # runs the measured-best config rather than a stale hardcoded one
        import dataclasses
        import json

        out_dir = Path(__file__).parent.parent / "runs" / "sweep"
        out_dir.mkdir(parents=True, exist_ok=True)
        cfg = all_configs[best]
        with open(out_dir / "best_config.json", "w") as f:
            json.dump(
                {
                    "name": best,
                    "scene": scene,
                    "throughput_hist_per_s": best_tp,
                    # record WHAT was measured so a partial sweep cannot
                    # silently read as a global best (ADVICE round 3)
                    "swept_configs": sorted(all_configs),
                    "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                               time.gmtime()),
                    "config": {
                        "n_lanes": cfg.n_lanes,
                        "max_virtual_trips": cfg.max_virtual_trips,
                        "n_resolves": cfg.n_resolves,
                        "event_fraction": cfg.event_fraction,
                        "resolve_inplace": cfg.resolve_inplace,
                        "sigma_mode": cfg.sigma_mode,
                        "spectrum_mode": cfg.spectrum_mode,
                        "rayleigh_mode": cfg.rayleigh_mode,
                        "paired_voxel_gather": cfg.paired_voxel_gather,
                    },
                },
                f,
                indent=2,
            )
            f.write("\n")
    if trace:
        run = make_run(all_configs[best])
        path = capture_trace(lambda: run(20_000_000, 11))
        rows = [f"{r['total_ms']:9.2f} ms  x{r['count']:<6} {r['name'][:110]}"
                for r in kernel_census(path, top=30)]
        for row in rows:
            print(f"  {row}", flush=True)
        print("trace at", path, flush=True)
        if scene != "smoke":
            out_dir = Path(__file__).parent.parent / "runs" / "sweep"
            out_dir.mkdir(parents=True, exist_ok=True)
            (out_dir / "census.txt").write_text(
                f"winner: {best} @ {best_tp:.3e} hist/s (scene {scene}, "
                f"20e6-history trace)\n" + "\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
