"""Measured feasibility experiment for the sorted/bucketed-DMA gather
scheme (VERDICT round-4 item 5, docs/ROOFLINE.md residual lever 2).

The scheme: per transport flight, sort live lanes by voxel block, DMA each
referenced block HBM -> VMEM once, then resolve per-lane values inside the
block with a one-hot MXU matmul (per-lane dynamic VMEM indexing does not
lower on Mosaic - engine/pallas_kernels.py). Its viability reduces to
three measurable numbers per 1M-lane flight:

  A. the XLA random-gather baseline it must beat (~9 ns/idx measured),
  B. the cost of sorting ~1M u32 keys (the scheme's per-flight overhead),
  C. the cost of the in-VMEM one-hot resolve (MXU) + the block DMA traffic.

This script measures A-C on hardware with the corrected fence (host
readback; jax.block_until_ready does not sync on this platform) and prints
a verdict: projected ns/history for the bucketed scheme vs the measured
XLA baseline. All numbers land in the output JSON for the roofline doc.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


def timed(fn, *args, reps=5):
    """Median wall time with a forced host readback per call."""
    import numpy as np

    out = fn(*args)  # compile
    _ = np.asarray(out.ravel()[0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@click.command()
@click.option("--n-lanes", type=int, default=1 << 20)
@click.option("--table-mb", type=int, default=500)
@click.option("--block-size", type=int, default=512,
              help="voxels per DMA block (one-hot width)")
@click.option("--output", type=click.Path(path_type=Path),
              default=Path("runs/pallas_bucket_experiment.json"))
def main(n_lanes, table_mb, block_size, output):
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_vox = table_mb * (1 << 20) // 4
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (n_vox,), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_lanes,), 0, n_vox,
                             dtype=jnp.int32)

    results = {"n_lanes": n_lanes, "table_mb": table_mb,
               "block_size": block_size}

    # --- A: XLA random gather baseline
    @jax.jit
    def xla_gather(t, i):
        return t[i]

    t_gather = timed(xla_gather, table, idx)
    results["xla_gather_s"] = t_gather
    results["xla_gather_ns_per_idx"] = t_gather / n_lanes * 1e9
    print(f"A. XLA gather: {t_gather*1e3:.2f} ms "
          f"({t_gather/n_lanes*1e9:.2f} ns/idx)", flush=True)

    # --- B: sort cost (keys only, and full sort-with-payload as the
    # scheme actually needs lane reordering or a permutation gather)
    @jax.jit
    def sort_keys(i):
        return jnp.sort(i)

    @jax.jit
    def argsort_keys(i):
        return jnp.argsort(i)

    t_sort = timed(sort_keys, idx)
    t_argsort = timed(argsort_keys, idx)
    results["sort_u32_s"] = t_sort
    results["argsort_u32_s"] = t_argsort
    results["sort_ns_per_lane"] = t_sort / n_lanes * 1e9
    print(f"B. sort: {t_sort*1e3:.2f} ms ({t_sort/n_lanes*1e9:.2f} ns/lane); "
          f"argsort: {t_argsort*1e3:.2f} ms", flush=True)

    # B2: the cheaper alternative - bucket histogram + stable counting
    # permutation via cumsum over a bounded number of buckets is also
    # lower-bounded by a full-width scatter; measure a segment-sum as proxy
    n_blocks = n_vox // block_size

    @jax.jit
    def bucket_hist(i):
        blk = i // block_size
        return jnp.zeros(n_blocks, jnp.int32).at[blk].add(1)

    t_hist = timed(bucket_hist, idx)
    results["bucket_histogram_s"] = t_hist
    print(f"B2. bucket histogram (scatter-add): {t_hist*1e3:.2f} ms",
          flush=True)

    # --- C: in-register one-hot resolve on the MXU, emulated at the XLA
    # level on a [n_groups, block_size] layout: lanes pre-grouped so that
    # each group's values live in one block row -> resolve = batched
    # one-hot matmul. This measures the per-lane MXU cost the Pallas
    # kernel would pay AFTER the DMA (the DMA itself is bandwidth-bound:
    # blocks_touched * block_size * 4 B at ~819 GB/s).
    n_groups = n_lanes // 128
    blocks = jax.random.uniform(key, (n_groups, block_size), jnp.float32)
    within = jax.random.randint(jax.random.PRNGKey(2), (n_groups, 128), 0,
                                block_size, dtype=jnp.int32)

    @jax.jit
    def onehot_resolve(blocks, within):
        oh = jax.nn.one_hot(within, block_size, dtype=jnp.float32)
        # [g, 128, B] x [g, B] -> [g, 128]
        return jnp.einsum("gib,gb->gi", oh, blocks,
                          preferred_element_type=jnp.float32)

    t_resolve = timed(onehot_resolve, blocks, within)
    results["onehot_resolve_s"] = t_resolve
    results["onehot_resolve_ns_per_lane"] = t_resolve / n_lanes * 1e9
    print(f"C. one-hot MXU resolve: {t_resolve*1e3:.2f} ms "
          f"({t_resolve/n_lanes*1e9:.2f} ns/lane)", flush=True)

    # --- verdict arithmetic
    # expected unique blocks touched by n random lanes over n_blocks
    exp_blocks = n_blocks * (1 - (1 - 1 / n_blocks) ** n_lanes)
    dma_bytes = exp_blocks * block_size * 4
    t_dma = dma_bytes / 819e9
    results["expected_blocks_touched"] = float(exp_blocks)
    results["dma_bytes"] = float(dma_bytes)
    results["dma_s_at_819GBps"] = float(t_dma)

    scheme = t_argsort + t_dma + t_resolve
    results["bucketed_scheme_s_per_flight"] = float(scheme)
    results["bucketed_vs_xla_gather"] = float(scheme / t_gather)
    verdict = ("WINS" if scheme < t_gather else "LOSES")
    results["verdict"] = (
        f"bucketed-DMA {verdict}: {scheme*1e3:.2f} ms vs XLA gather "
        f"{t_gather*1e3:.2f} ms per 1M-lane flight "
        f"(argsort {t_argsort*1e3:.2f} + DMA {t_dma*1e3:.2f} + resolve "
        f"{t_resolve*1e3:.2f})"
    )
    print(results["verdict"], flush=True)

    output.parent.mkdir(parents=True, exist_ok=True)
    with open(output, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
