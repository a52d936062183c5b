"""Per-op microbenchmark for the transport engine's primitive costs on the
current accelerator: random gathers/scatter-adds at engine-realistic shapes,
one-hot MXU selects, broadcast-compare table lookups, and RNG draws.

The numbers anchor docs/ROOFLINE.md: the engine retires a history with a
fixed budget of index-ops (voxel gathers, sigma-pair gathers, alias draws,
tally scatter slots), so `histories/s <= 1 / (index_op_slots_per_history *
seconds_per_index_op)`. This script measures seconds_per_index_op directly,
isolated from the engine's arithmetic.

Sync caveat (axon tunnel): ``jax.block_until_ready`` does NOT synchronize on
this platform (a 8192^3 matmul "finishes" in 40 us). Every timing loop here
therefore reduces the output to a scalar and forces a host readback, and the
one-roundtrip pipeline cost is measured separately and subtracted.

Usage:  python scripts/microbench_ops.py [--out runs/microbench.json]
"""

import json
import time
from pathlib import Path

import click


@click.command()
@click.option("--out", type=click.Path(path_type=Path),
              default=Path("runs/microbench.json"))
@click.option("--n", "n_idx", type=int, default=1 << 20,
              help="index batch size (engine lane count)")
def main(out, n_idx):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    key = jax.random.PRNGKey(0)
    results = {"device": str(jax.devices()[0]), "n_idx": n_idx}

    # one-roundtrip pipeline overhead, subtracted from every measurement
    trivial = jax.jit(lambda x: (x + 1.0).sum().reshape(1))
    xx = jnp.ones((8,), jnp.float32)

    def timed(fn, *args, n_iter=20):
        r = fn(*args)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = fn(*args)
        np.asarray(r)
        total = time.perf_counter() - t0
        # same-length trivial pipeline = enqueue + one roundtrip
        r = trivial(xx)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = trivial(xx)
        np.asarray(r)
        base = time.perf_counter() - t0
        return max(total - base, 1e-9) / n_iter

    def report(name, seconds, n_ops=n_idx):
        ns = seconds / n_ops * 1e9
        results[name] = {"ms": seconds * 1e3, "ns_per_idx": ns}
        print(f"{name:44s} {seconds*1e3:9.3f} ms  {ns:8.3f} ns/idx",
              flush=True)

    reduce_sum = lambda y: y.sum(dtype=jnp.float32).reshape(1) \
        if y.dtype != jnp.float32 else y.sum().reshape(1)

    # ---- random gathers: per-index cost vs table size ---------------------
    for size_mb, label in [(0.004, "4KB"), (0.25, "256KB"), (4, "4MB"),
                           (64, "64MB"), (512, "512MB")]:
        n_rows = max(64, int(size_mb * 1e6 / 4))
        table = jnp.ones((n_rows,), jnp.float32)
        idx = jax.random.randint(key, (n_idx,), 0, n_rows, dtype=jnp.int32)
        f = jax.jit(lambda t, i: t[i].sum().reshape(1))
        report(f"gather_f32_{label}", timed(f, table, idx))

    # ---- element width: u8 / u32 / f32x2 / f32x4 rows ---------------------
    n_rows = 1 << 27
    idx = jax.random.randint(key, (n_idx,), 0, n_rows, dtype=jnp.int32)
    t8 = jnp.ones((n_rows,), jnp.uint8)
    f = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum().reshape(1))
    report("gather_u8_128MB", timed(f, t8, idx))

    for w in (2, 4):
        tw = jnp.ones((1 << 22, w), jnp.float32)
        idw = jax.random.randint(key, (n_idx,), 0, 1 << 22, dtype=jnp.int32)
        f = jax.jit(lambda t, i: t[i].sum().reshape(1))
        report(f"gather_f32x{w}_row", timed(f, tw, idw))

    # ---- row-gather [N,2] cost vs TABLE SIZE (voxel-compression lever:
    # would a u16/u8-packed volume move the gather into a cheaper regime?)
    for rows_log2, label in [(22, "32MB"), (24, "128MB"), (25, "256MB"),
                             (26, "512MB")]:
        nr = 1 << rows_log2
        t2 = jnp.ones((nr, 2), jnp.uint32)
        i2 = jax.random.randint(key, (n_idx,), 0, nr, dtype=jnp.int32)
        f = jax.jit(
            lambda t, i: t[i].astype(jnp.float32).sum().reshape(1))
        report(f"gather_u32x2row_{label}", timed(f, t2, i2))
        t2_16 = jnp.ones((nr, 2), jnp.uint16)
        report(f"gather_u16x2row_{label}", timed(f, t2_16, i2))

    # ---- gather cost vs BATCH SIZE (the unexplained 64k-beats-1M effect) --
    big = jnp.ones((1 << 26, 2), jnp.uint32)  # 512 MB paired table
    for bs_log2 in (14, 15, 16, 17, 18, 20):
        bs = 1 << bs_log2
        ib = jax.random.randint(key, (bs,), 0, 1 << 26, dtype=jnp.int32)
        f = jax.jit(
            lambda t, i: t[i].astype(jnp.float32).sum().reshape(1))
        report(f"gather_u32x2row_512MB_batch{bs >> 10}k",
               timed(f, big, ib, n_iter=50), n_ops=bs)

    # ---- dependent chain vs independent gathers ----------------------------
    tbl = jax.random.randint(key, (n_rows,), 0, n_rows, dtype=jnp.int32)
    idx = jax.random.randint(key, (n_idx,), 0, n_rows, dtype=jnp.int32)

    @jax.jit
    def chain4(t, i):
        for _ in range(4):
            i = t[i] & (n_rows - 1)
        return i.sum(dtype=jnp.float32).reshape(1)

    report("gather_chain4_dep", timed(chain4, tbl, idx), n_ops=4 * n_idx)

    @jax.jit
    def indep4(t, i):
        acc = t[i] + t[(i + 1) & (n_rows - 1)]
        acc = acc + t[(i * 5 + 7) & (n_rows - 1)] + t[(i * 3 + 13) & (n_rows - 1)]
        return acc.sum(dtype=jnp.float32).reshape(1)

    report("gather_indep4", timed(indep4, tbl, idx), n_ops=4 * n_idx)

    # ---- scatter-add at engine shapes --------------------------------------
    npix = 1848 * 768 * 4
    img = jnp.zeros((npix,), jnp.float32)
    sidx = jax.random.randint(key, (n_idx,), 0, npix, dtype=jnp.int32)
    vals = jnp.ones((n_idx,), jnp.float32)
    f = jax.jit(lambda im, i, v: im.at[i].add(v, mode="drop").sum().reshape(1))
    report("scatter_add_23MB", timed(f, img, sidx, vals))

    img_s = jnp.zeros((116 * 48 * 4,), jnp.float32)
    sidx_s = jax.random.randint(key, (n_idx,), 0, 116 * 48 * 4, jnp.int32)
    report("scatter_add_89KB", timed(f, img_s, sidx_s, vals))

    # 2-column row scatter (event scatter-back shape)
    c_e = int(n_idx * 0.35)
    staging = jnp.zeros((n_idx, 2), jnp.float32)
    rows = jax.random.randint(key, (c_e,), 0, n_idx, dtype=jnp.int32)
    rv = jnp.ones((c_e, 2), jnp.float32)
    f2 = jax.jit(lambda s, r, v: s.at[r].set(v, mode="drop").sum().reshape(1))
    report("scatter_set_2col_event", timed(f2, staging, rows, rv), n_ops=c_e)

    # ---- sort (for locality-bucketing feasibility) --------------------------
    keys32 = jax.random.randint(key, (n_idx,), 0, 1 << 30, dtype=jnp.int32)
    f = jax.jit(lambda k: jnp.sort(k)[:1].astype(jnp.float32))
    report("sort_1M_u32", timed(f, keys32, n_iter=5))

    f = jax.jit(lambda k: jnp.argsort(k)[:1].astype(jnp.float32))
    report("argsort_1M_u32", timed(f, keys32, n_iter=5))

    # ---- cumsum (stream compaction cost) ------------------------------------
    m = jax.random.bernoulli(key, 0.3, (n_idx,))
    f = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32))[-1:].astype(jnp.float32))
    report("cumsum_1M", timed(f, m))

    # ---- gather-free small-table lookup: broadcast-compare over 128 bins ---
    cdf = jnp.sort(jax.random.uniform(key, (128,)))
    u = jax.random.uniform(key, (n_idx,))

    @jax.jit
    def bcast_lookup(u, cdf):
        cnt = (u[:, None] >= cdf[None, :]).sum(1)
        val = ((cnt[:, None] == jnp.arange(128)[None, :]) * cdf[None, :]).sum(1)
        return (cnt.astype(jnp.float32) + val).sum().reshape(1)

    report("bcast_compare128_lookup", timed(bcast_lookup, u, cdf))

    # ---- one-hot MXU coefficient fetch: [n,22]@[22,16] ----------------------
    mats = jax.random.randint(key, (n_idx,), 0, 22, dtype=jnp.int32)
    cf16 = jnp.ones((22, 16), jnp.float32)

    @jax.jit
    def poly_onehot(t, m, c):
        oh = (m[:, None] == jnp.arange(22, dtype=jnp.int32)[None, :]).astype(
            jnp.float32)
        cc = oh @ c
        acc = cc[:, 0]
        for k in range(1, 16):
            acc = acc * t + cc[:, k]
        return acc.sum().reshape(1)

    t_arg = jax.random.uniform(key, (n_idx,))
    report("poly_onehot22_deg16", timed(poly_onehot, t_arg, mats, cf16))

    # where-chain variant (VPU only)
    @jax.jit
    def poly_select(t, m, c):
        acc = jnp.zeros((n_idx,), jnp.float32)
        for j in range(22):
            a = jnp.full((n_idx,), c[j, 0])
            for k in range(1, 16):
                a = a * t + c[j, k]
            acc = jnp.where(m == j, a, acc)
        return acc.sum().reshape(1)

    report("poly_wherechain22_deg16", timed(poly_select, t_arg, mats, cf16))

    # ---- RNG draws ----------------------------------------------------------
    kk = jax.random.wrap_key_data(
        jax.random.bits(key, (4,), jnp.uint32), impl="rbg")

    @jax.jit
    def draw(k):
        k2 = jax.random.split(k, 2)[0]
        return jax.random.uniform(k2, (8, n_idx)).sum().reshape(1)

    report("rng_rbg_8xN", timed(draw, kk), n_ops=8 * n_idx)

    # ---- element-wise baseline: 32 fused FMAs + 3 exps ----------------------
    x = jax.random.uniform(key, (n_idx,))

    @jax.jit
    def fma32(x):
        acc = x
        for _ in range(32):
            acc = acc * 1.000001 + 0.3
        return acc.sum().reshape(1)

    report("fma32_elementwise", timed(fma32, x), n_ops=32 * n_idx)

    @jax.jit
    def exp3(x):
        return (jnp.exp(x) + jnp.exp(0.5 * x) + jnp.exp(0.25 * x)).sum().reshape(1)

    report("exp3_elementwise", timed(exp3, x), n_ops=3 * n_idx)

    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"\nwritten to {out}")


if __name__ == "__main__":
    main()
