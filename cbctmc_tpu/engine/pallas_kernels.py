"""Pallas TPU kernels for the transport hot path (experimental).

The XLA engine's throughput is bounded by per-kernel dispatch overhead
(hundreds of small fused kernels per transport iteration — see
docs/PHYSICS_VALIDATION.md). The long-term fix is fusing the Woodcock
flight loop into a single Mosaic kernel with the interpolation tables
resident in VMEM. This module contains the first step: a fused
multi-flight kernel over VMEM-resident voxel grids (phantom-scale scenes;
HBM-tiled voxel access is future work), plus the feasibility probe for
per-lane dynamic gathers that the design depends on.

Run :func:`probe_vmem_gather` on hardware to verify the lowering before
relying on the kernel path.

Hardware finding (TPU v5e, jax 0.9 Mosaic): per-lane dynamic vector
indexing of a VMEM table (``table[idx_vector]``) does NOT lower ("Cannot do
int indexing on TPU") — the probe returns False. Consequences for the
megakernel design: small tables (the 22-entry material axis) can be
gathered via one-hot matmuls on the MXU, but voxel-grid lookups must stay
in XLA's native gather (which is fast: 0.02-0.06 ms per 1M lanes) or move
to a sorted/bucketed DMA scheme. The flight kernel below is therefore a
prototype exercised in interpret mode only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(table_ref, idx_ref, out_ref):
    out_ref[:] = table_ref[idx_ref[:]]


def probe_vmem_gather(n: int = 8192, table_size: int = 32768,
                      interpret: bool = False) -> bool:
    """Check that per-lane dynamic gathers from a VMEM-resident table lower
    and produce correct values; returns True on success."""
    table = jnp.arange(table_size, dtype=jnp.float32) * 2.0
    idx = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, table_size)
    try:
        out = pl.pallas_call(
            _gather_kernel,
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(table, idx)
        ok = bool(jnp.allclose(out, table[idx]))
        return ok
    except Exception as exc:  # lowering not supported on this backend
        import logging

        logging.getLogger(__name__).warning("VMEM gather probe failed: %s", exc)
        return False


def _flight_kernel(
    # scalar prefetch
    n_flights_ref,
    # inputs (VMEM)
    pos_ref,  # [3, n]
    dir_ref,  # [3, n]
    state_ref,  # [4, n] energy, mfp_wc, ebin*n_materials, (unused)
    active_ref,  # [1, n] 1.0 = transporting
    u_ref,  # [n_flights, 2, n] uniforms
    voxmat_ref,  # [nvox_pad] material (as f32, 0-based)
    voxden_ref,  # [nvox_pad] density
    mfp_ab_ref,  # [rows, 2] total inverse-MFP interpolation (a, b)
    geom_ref,  # [8] inv_voxel x/y/z, bbox x/y/z, nx, nxny
    # outputs
    out_pos_ref,  # [3, n]
    out_flags_ref,  # [4, n] pending, escaped, randno, mfp_density
):
    """Fused Woodcock flights: every lane performs up to n_flights virtual
    steps (gather voxel, test real event) entirely inside one kernel."""
    inv_vx = geom_ref[0]
    inv_vy = geom_ref[1]
    inv_vz = geom_ref[2]
    bx = geom_ref[3]
    by = geom_ref[4]
    bz = geom_ref[5]
    nx = geom_ref[6]
    nxny = geom_ref[7]

    px, py, pz = pos_ref[0, :], pos_ref[1, :], pos_ref[2, :]
    dx, dy, dz = dir_ref[0, :], dir_ref[1, :], dir_ref[2, :]
    energy = state_ref[0, :]
    mfp_wc = state_ref[1, :]
    eps = 1.5e-5

    pending = jnp.zeros_like(px)
    escaped = jnp.zeros_like(px)
    randno = jnp.zeros_like(px)
    mfp_density = jnp.zeros_like(px)
    active = active_ref[0, :]

    n_flights = n_flights_ref[0]

    def flight(i, carry):
        px, py, pz, pending, escaped, randno, mfp_density = carry
        act = (active > 0.5) & (pending < 0.5) & (escaped < 0.5)
        u_step = u_ref[i, 0, :]
        u_int = u_ref[i, 1, :]
        step = -mfp_wc * jnp.log(u_step)
        npx = jnp.where(act, px + step * dx, px)
        npy = jnp.where(act, py + step * dy, py)
        npz = jnp.where(act, pz + step * dz, pz)
        inside = (
            (npx >= eps) & (npx <= bx - eps)
            & (npy >= eps) & (npy <= by - eps)
            & (npz >= eps) & (npz <= bz - eps)
        )
        vx = jnp.clip((npx * inv_vx).astype(jnp.int32), 0, 1 << 30)
        vy = (npy * inv_vy).astype(jnp.int32)
        vz = (npz * inv_vz).astype(jnp.int32)
        vox = vx + vy * nx.astype(jnp.int32) + vz * nxny.astype(jnp.int32)
        vox = jnp.clip(vox, 0, voxden_ref.shape[0] - 1)

        mat = voxmat_ref[vox].astype(jnp.int32)
        den = voxden_ref[vox]
        # per-(ebin, material) total inverse-MFP row; the lane's energy bin
        # offset (ebin * n_materials) is precomputed in state_ref[2]
        row = state_ref[2, :].astype(jnp.int32) + mat
        inv_mfp = mfp_ab_ref[row, 0] + energy * mfp_ab_ref[row, 1]
        mfp_den = mfp_wc * den
        p_delta = 1.0 - mfp_den * inv_mfp
        real = act & inside & (u_int >= p_delta)
        newly_escaped = act & ~inside

        return (
            npx, npy, npz,
            jnp.where(real, 1.0, pending),
            jnp.where(newly_escaped, 1.0, escaped),
            jnp.where(real, u_int, randno),
            jnp.where(real, mfp_den, mfp_density),
        )

    px, py, pz, pending, escaped, randno, mfp_density = jax.lax.fori_loop(
        0, n_flights, flight, (px, py, pz, pending, escaped, randno, mfp_density)
    )
    out_pos_ref[0, :] = px
    out_pos_ref[1, :] = py
    out_pos_ref[2, :] = pz
    out_flags_ref[0, :] = pending
    out_flags_ref[1, :] = escaped
    out_flags_ref[2, :] = randno
    out_flags_ref[3, :] = mfp_density
