"""Attributed engine profile: trace one production transport call, census
the device kernels, and map the hot fusions back to HLO ops + source lines.

This is the maintained version of the ad-hoc trace/HLO tooling used for the
engine v2/v3 optimisation rounds (docs/ROADMAP.md).  The reference's only
profiling was wall-clock prints (MC-GPU_v1.3.cu:2806-2812 speed report);
here the census comes from the xprof trace (utils/profiling.py) and the
attribution from the compiled HLO's metadata.

Usage (TPU):
    python scripts/profile_engine.py --scene 256 --output runs/profile_r3
    python scripts/profile_engine.py --scene full --lanes 20 --trips 4
"""

import json
import re
import sys
import time
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


def split_hlo_computations(hlo: str) -> dict:
    """computation name -> list of instruction lines."""
    bodies = {}
    cur, body = None, []
    for line in hlo.splitlines():
        stripped = line.strip()
        if stripped.startswith(("%", "ENTRY")) and stripped.endswith("{"):
            if cur is not None:
                bodies[cur] = body
            head = stripped.split("(")[0].replace("ENTRY", "").strip()
            cur, body = head.lstrip("%").strip(), []
        elif stripped == "}":
            if cur is not None:
                bodies[cur] = body
            cur, body = None, []
        elif cur is not None:
            body.append(line)
    return bodies


def attribute_kernel(name: str, bodies: dict) -> dict:
    """Find the fusion/instruction `name` in any computation; summarise the
    called computation's op mix and source lines."""
    instr_re = re.compile(rf"%{re.escape(name)} = ")
    called = None
    out_shape = None
    for comp, lines in bodies.items():
        for line in lines:
            if instr_re.search(line):
                m = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", line)
                called = m.group(1) if m else None
                ms = re.search(rf"%{re.escape(name)} = ([^ ]+)", line)
                out_shape = ms.group(1) if ms else None
                break
        if called or out_shape:
            break
    if called is None and out_shape is None:
        return {"found": False}
    ops = Counter()
    srcs = Counter()
    mem_ops = []
    src_re = re.compile(r'source_file="([^"]+)".*?source_line=(\d+)')
    op_re = re.compile(r"=\s*\S+\s+([a-z][\w\-]*)\(")
    for line in bodies.get(called, []):
        mo = op_re.search(line)
        sm = src_re.search(line)
        src = f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else None
        if mo:
            ops[mo.group(1)] += 1
            if mo.group(1) in ("gather", "scatter", "dynamic-slice",
                               "dynamic-update-slice", "sort"):
                mem_ops.append((mo.group(1), src or "?"))
        if src:
            srcs[src] += 1
    return {
        "found": True,
        "out_shape": out_shape,
        "ops": dict(ops.most_common(12)),
        "mem_ops": mem_ops[:10],
        "top_sources": [s for s, _ in srcs.most_common(8)],
    }


@click.command()
@click.option("--scene", type=click.Choice(["full", "256", "smoke"]),
              default="256", help="full=500^3@1mm (bench scene), 256=256^3@2mm")
@click.option("--lanes", type=int, default=20, help="log2 photon lanes")
@click.option("--trips", type=int, default=4, help="flights per iteration")
@click.option("--event-fraction", type=float, default=0.35)
@click.option("--n-histories", type=float, default=2e6,
              help="histories for the traced call")
@click.option("--output", type=click.Path(path_type=Path),
              default=Path("runs/profile"))
@click.option("--top", type=int, default=24)
def main(scene, lanes, trips, event_fraction, n_histories, output, top):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
    from cbctmc_tpu.engine.tables import build_device_tables
    from cbctmc_tpu.engine.transport import (
        EngineConfig, make_scene, run_projection,
    )
    from cbctmc_tpu.geometry.phantoms import CatPhan604Geometry
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.physics.spectrum import default_spectrum
    from cbctmc_tpu.utils.profiling import capture_trace, kernel_census

    output.mkdir(parents=True, exist_ok=True)

    shape, spacing_mm = {
        "full": ((500, 500, 500), 1.0),
        "256": ((256, 256, 256), 2.0),
        "smoke": ((64, 64, 64), 4.0),
    }[scene]
    n_pix = (116, 48) if scene == "smoke" else (1848, 768)
    config = EngineConfig(
        n_lanes=1 << (14 if scene == "smoke" else lanes),
        max_virtual_trips=trips, event_fraction=event_fraction,
    )

    table_set = default_material_set()
    tables = build_device_tables(table_set, default_spectrum())
    phantom = CatPhan604Geometry(shape=shape, image_spacing=(spacing_mm,) * 3)
    mats = np.ascontiguousarray(
        np.rot90(phantom.materials, k=3, axes=(0, 1))
    ).astype(np.int32) - 1
    dens = np.ascontiguousarray(np.rot90(phantom.densities, k=3, axes=(0, 1)))
    volume, woodcock = make_scene(
        table_set, mats, dens, (spacing_mm / 10.0,) * 3
    )

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

    # NB: run_projection is already jitted; wrap only the call, passing the
    # tables/volume as ARGUMENTS. A closure would bake the 500 MB packed
    # volume into the HLO as a literal, which overflows the remote-compile
    # tunnel's request limit (HTTP 413).
    def jitted(nh, k):
        return run_projection(
            tables, woodcock, volume, src, det, nh, k,
            n_pixels_x=n_pix[0], n_pixels_z=n_pix[1], config=config,
        )

    nh = jnp.int32(int(n_histories))

    print("compiling...", flush=True)
    t0 = time.monotonic()
    lowered = run_projection.lower(
        tables, woodcock, volume, src, det, nh, jax.random.PRNGKey(0),
        n_pixels_x=n_pix[0], n_pixels_z=n_pix[1], config=config,
    )
    compiled = lowered.compile()
    hlo = compiled.as_text()
    (output / "hlo.txt").write_text(hlo)
    print(f"compiled in {time.monotonic() - t0:.0f}s; "
          f"HLO {len(hlo)/1e6:.1f} MB", flush=True)

    # warmup then trace
    jax.block_until_ready(jitted(nh, jax.random.PRNGKey(1)))
    t0 = time.monotonic()
    trace_path = capture_trace(
        lambda: jitted(nh, jax.random.PRNGKey(2)),
        trace_dir=str(output / "trace"),
    )
    wall = time.monotonic() - t0
    census = kernel_census(trace_path, top=top)

    bodies = split_hlo_computations(hlo)
    report = {"scene": scene, "config": {
        "n_lanes": config.n_lanes, "trips": trips,
        "event_fraction": event_fraction, "n_histories": int(n_histories)},
        "wall_s": wall, "histories_per_s_wall": int(n_histories) / wall,
        "kernels": []}
    total_ms = sum(row["total_ms"] for row in census)
    print(f"\ntraced call: {wall:.2f}s wall, {int(n_histories)/wall:.3e} "
          f"hist/s; top-{top} kernels {total_ms:.0f} ms device\n", flush=True)
    for row in census:
        attr = attribute_kernel(row["name"], bodies)
        entry = {**row, **attr}
        report["kernels"].append(entry)
        line = f"{row['total_ms']:9.2f} ms x{row['count']:<4} {row['name']}"
        if attr.get("found"):
            line += f"  out={attr.get('out_shape')}"
        print(line)
        if attr.get("found"):
            if attr["ops"]:
                print(f"            ops: {attr['ops']}")
            if attr["mem_ops"]:
                print(f"            mem: {attr['mem_ops'][:6]}")
            if attr["top_sources"]:
                print(f"            src: {attr['top_sources'][:5]}")
    with open(output / "profile.json", "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nwritten to {output}/profile.json", flush=True)


if __name__ == "__main__":
    main()
