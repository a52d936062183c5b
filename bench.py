"""Benchmark entry point (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the MC engine's photon throughput on the reference's headline
workload shape: a CatPhan604 phantom voxelised at 1 mm on a 500^3 grid with
the full-size Varian half-fan simulation detector (1848x768 px,
717.024x297.984 mm, SID 1000 / SDD 1500 mm - cbctmc/defaults.py:60-65 in
the reference). The baseline constant is an estimate of MC-GPU v1.3 on an
RTX A6000 for comparable CT scenes - MC-GPU publishes ~1e7 histories/s on
2009-era hardware (Badal & Badano 2009); scaling to an A6000 gives O(5e8)
histories/s, which is recorded here as the reference point until a measured
number is available.

Usage: python bench.py [--smoke]   (--smoke: tiny scene, quick check)
"""

import json
import sys
import time

BASELINE_HISTORIES_PER_S = 5.0e8


def main():
    smoke = "--smoke" in sys.argv

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
    from cbctmc_tpu.engine.tables import build_device_tables
    from cbctmc_tpu.engine.transport import (
        EngineConfig,
        make_scene,
        run_projection,
    )
    from cbctmc_tpu.geometry.phantoms import CatPhan604Geometry
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.physics.spectrum import default_spectrum

    table_set = default_material_set()
    tables = build_device_tables(table_set, default_spectrum())

    if smoke:
        shape, spacing_mm = (64, 64, 64), 4.0
        n_pix = (116, 48)
        config = EngineConfig(n_lanes=1 << 14, max_virtual_trips=8)
        chunk, n_chunks = 200_000, 2
    else:
        # full-size reference scene: 500^3 @ 1 mm, 1848x768 detector.
        # T=4 flights/iteration is the v3.2 sweep winner on this scene with
        # the two-tier soft majorant: 4.08e6 hist/s at 73% flight-slot
        # utilisation (T=8: 3.51e6 at 44%)
        shape, spacing_mm = (500, 500, 500), 1.0
        n_pix = (1848, 768)
        config = EngineConfig(
            n_lanes=1 << 20, max_virtual_trips=4, event_fraction=0.35
        )
        chunk, n_chunks = 100_000_000, 3
        # prefer the recorded sweep winner over the hardcoded default
        # (scripts/sweep_engine_configs.py writes this after each sweep)
        best_path = "/root/repo/runs/sweep/best_config.json"
        try:
            with open(best_path) as f:
                best = json.load(f)
            config = EngineConfig(**best["config"])
            print(f"# using sweep winner {best['name']} from {best_path}",
                  file=sys.stderr)
        except (OSError, KeyError, TypeError, ValueError):
            pass

    phantom = CatPhan604Geometry(shape=shape, image_spacing=(spacing_mm,) * 3)
    mats = np.ascontiguousarray(
        np.rot90(phantom.materials, k=3, axes=(0, 1))
    ).astype(np.int32) - 1
    dens = np.ascontiguousarray(np.rot90(phantom.densities, k=3, axes=(0, 1)))
    volume, woodcock = make_scene(table_set, mats, dens, (spacing_mm / 10.0,) * 3)

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

    from cbctmc_tpu.engine.transport import LaneState

    def _empty_carry(n):
        return LaneState.empty(n, n_pix[0] * n_pix[1])

    def run(n, seed, carry, last):
        out = run_projection(
            tables, woodcock, volume, src, det,
            jnp.int32(n), jax.random.PRNGKey(seed),
            n_pixels_x=n_pix[0], n_pixels_z=n_pix[1], config=config,
            carry_in=carry, return_carry=not last,
        )
        if last:
            # force a host readback: jax.block_until_ready does NOT
            # synchronize on the axon tunnel platform (verified against
            # device traces, runs/microbench.json) - a tiny-scalar
            # np.asarray is the only reliable fence
            np.asarray(jnp.sum(out))
            return out, None
        img, extras = out
        return img, extras["carry"]

    # compile + warmup both traces
    _, c = run(min(chunk, 2_000_000), 0, _empty_carry(config.n_lanes), False)
    run(min(chunk, 2_000_000), 0, c, True)

    # production shape: chunks hand surviving photons forward; the drain
    # tail runs once at the end (as MCScanner does per projection)
    t0 = time.monotonic()
    total = 0
    carry = _empty_carry(config.n_lanes)
    for i in range(n_chunks):
        img, carry = run(chunk, i + 1, carry, last=i == n_chunks - 1)
        total += chunk
    dt = time.monotonic() - t0
    value = total / dt

    print(
        json.dumps(
            {
                "metric": "photon_histories_per_second_per_chip",
                "value": value,
                "unit": "histories/s",
                "vs_baseline": value / BASELINE_HISTORIES_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
