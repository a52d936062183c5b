"""Multi-chip distribution of the MC engine.

The reference parallelises with MPI over GPUs: per-GPU speed test, histories
split proportional to measured speed, detector images summed with MPI_Reduce
(docker/mcgpu/MC-GPU_v1.3.cu:667-1034). On TPU this becomes:

- photon-history data parallelism over a ``jax.sharding.Mesh`` axis
  ("photons"): every device runs the identical transport kernel on its own
  history budget with a decorrelated counter-based RNG key (the analogue of
  RANECU sequence splitting / update_seed_PRNG),
- detector tallies reduced with ``psum`` over ICI (the MPI_Reduce
  equivalent),
- optional second mesh axis ("proj") that distributes whole projections —
  the scan's embarrassingly-parallel outer loop.

TPU chips are homogeneous, so the reference's runtime speed test and
speed-weighted splitting are unnecessary: the budget is split equally.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cbctmc_tpu.engine.ct import DetectorGeom
from cbctmc_tpu.engine.samplers import FanBeamSource
from cbctmc_tpu.engine.tables import DeviceTables, WoodcockTable
from cbctmc_tpu.engine.transport import EngineConfig, VoxelVolume, run_projection


def make_mesh(
    n_proj_shards: int = 1, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    """Build a (proj, photons) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_proj_shards:
        raise ValueError(f"{n} devices not divisible by {n_proj_shards} proj shards")
    arr = np.array(devices).reshape(n_proj_shards, n // n_proj_shards)
    return Mesh(arr, axis_names=("proj", "photons"))


def split_histories(n_histories: int, n_shards: int) -> np.ndarray:
    """Equal split with the remainder spread over the first shards."""
    base = n_histories // n_shards
    out = np.full(n_shards, base, np.int64)
    out[: n_histories - base * n_shards] += 1
    return out


def run_projection_sharded(
    mesh: Mesh,
    tables: DeviceTables,
    woodcock: WoodcockTable,
    volume: VoxelVolume,
    source: FanBeamSource,
    detector: DetectorGeom,
    n_histories: int,
    key: jax.Array,
    n_pixels_x: int,
    n_pixels_z: int,
    config: EngineConfig = EngineConfig(),
) -> jnp.ndarray:
    """One projection sharded over the mesh's "photons" axis; the returned
    image is the psum over all shards (replicated)."""
    n_shards = mesh.shape["photons"] * mesh.shape.get("proj", 1)
    budgets = jnp.asarray(
        split_histories(n_histories, n_shards).astype(np.int32)
    )
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_shards))

    flat_spec = (
        P(("proj", "photons")) if "proj" in mesh.shape else P("photons")
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(flat_spec, flat_spec),
        out_specs=P(),
        check_vma=False,
    )
    def _run(budget_shard, key_shard):
        img = run_projection(
            tables, woodcock, volume, source, detector,
            budget_shard[0], key_shard[0],
            n_pixels_x=n_pixels_x, n_pixels_z=n_pixels_z, config=config,
        )
        img = jax.lax.psum(img, "photons")
        if "proj" in mesh.shape:
            img = jax.lax.psum(img, "proj")
        return img

    return _run(budgets, keys)


def run_scan_sharded(
    mesh: Mesh,
    tables: DeviceTables,
    woodcock: WoodcockTable,
    volume: VoxelVolume,
    source: FanBeamSource,  # batched [P, ...]
    detector: DetectorGeom,  # batched [P, ...]
    n_projections: int,
    n_histories_per_projection: int,
    key: jax.Array,
    n_pixels_x: int,
    n_pixels_z: int,
    config: EngineConfig = EngineConfig(),
) -> jnp.ndarray:
    """A scan step distributed over a 2-D (proj, photons) mesh: each "proj"
    row of the mesh simulates its own subset of projections while the
    "photons" axis splits histories within a projection. Returns the stacked
    images [n_projections, 4, n_pixels_z, n_pixels_x].

    This is the framework's full multi-chip step (the analogue of a training
    step for this workload): independent per-(projection-shard, photon-shard)
    transport, photon-axis psum of tallies, projection-axis all_gather.

    ``n_projections`` need not divide the "proj" mesh axis: the projection
    set is padded to the next multiple (the padded slots run with a zero
    history budget, which exits the transport loop immediately) and the
    padding is sliced off the returned stack.
    """
    n_proj_shards = mesh.shape["proj"]
    n_photon_shards = mesh.shape["photons"]
    n_local_proj = -(-n_projections // n_proj_shards)  # ceil
    p_pad = n_local_proj * n_proj_shards
    if p_pad != n_projections:
        def pad_tail(x):
            reps = jnp.repeat(x[-1:], p_pad - n_projections, axis=0)
            return jnp.concatenate([jnp.asarray(x), reps], axis=0)

        source = jax.tree.map(pad_tail, source)
        detector = jax.tree.map(pad_tail, detector)

    per_photon = split_histories(
        n_histories_per_projection, n_photon_shards
    ).astype(np.int32)
    # [proj_shard, local_proj, photon_shard]; padded projections get budget 0
    budgets = np.tile(per_photon[None, None], (n_proj_shards, n_local_proj, 1))
    global_idx = np.arange(p_pad).reshape(n_proj_shards, n_local_proj)
    budgets[global_idx >= n_projections] = 0
    budgets = jnp.asarray(budgets)
    keys = jax.vmap(
        lambda i: jax.vmap(lambda j: jax.random.fold_in(jax.random.fold_in(key, i), j))(
            jnp.arange(n_photon_shards)
        )
    )(jnp.arange(n_proj_shards))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P("proj", None, "photons"),
            P("proj", "photons"),
            jax.tree.map(lambda _: P("proj"), source),
            jax.tree.map(lambda _: P("proj"), detector),
        ),
        out_specs=P("proj"),
        check_vma=False,
    )
    def _run(budget_shard, key_shard, source_shard, detector_shard):
        def one(i, acc):
            src_i = jax.tree.map(lambda x: x[i], source_shard)
            det_i = jax.tree.map(lambda x: x[i], detector_shard)
            img = run_projection(
                tables, woodcock, volume, src_i, det_i,
                budget_shard[0, i, 0],
                jax.random.fold_in(key_shard[0, 0], i),
                n_pixels_x=n_pixels_x, n_pixels_z=n_pixels_z, config=config,
            )
            img = jax.lax.psum(img, "photons")
            return acc.at[i].set(img)

        acc = jnp.zeros(
            (n_local_proj, 4, n_pixels_z, n_pixels_x), jnp.float32
        )
        return jax.lax.fori_loop(0, n_local_proj, one, acc)

    return _run(budgets, keys, source, detector)[:n_projections]


def initialize_multi_host(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialise jax.distributed for multi-host (pod-scale) meshes.

    Within a pod slice, detector-tally psums ride ICI; across hosts they
    traverse DCN — the layout in :func:`make_mesh` keeps the "photons" axis
    innermost so the high-frequency reduction stays on ICI (the reference's
    MPI ran everything over the host network; MC-GPU_v1.3.cu:1016-1034).
    On TPU pods the arguments are auto-detected from the environment.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.devices()
