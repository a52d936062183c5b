"""Bisect the TPU-worker crash seen in the 4D demo's ROOSTER step.

Runs each suspect op group at the exact 4D-demo shapes on random data,
with a forced host readback after every stage, smallest first:

1. FDK reconstruction (voxel-driven gather backprojection)
2. one `_project_one` forward (fori_loop gather chain)
3. one `_splat_one` adjoint (fori_loop scatter-add chain)
4. one vmapped projector/adjoint pair at the CG chunk width
5. one full `cg_update`-equivalent (CG on the normal equations)

The stage that kills the worker is the one whose banner is the last in
the log. Each stage prints `<name> OK <seconds>s`.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", nargs="*", default=None,
                    help="subset of stage names to run (default: all)")
    ap.add_argument("--nu", type=int, default=462)
    ap.add_argument("--nv", type=int, default=192)
    ap.add_argument("--shape", type=int, nargs=3, default=(180, 80, 180))
    ap.add_argument("--spacing", type=float, default=2.0)
    ap.add_argument("--n-projections", type=int, default=72)
    ap.add_argument("--proj-chunk", type=int, default=3)
    ap.add_argument("--cg-iterations", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cbctmc_tpu.recon.fdk import fdk_reconstruct
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid
    from cbctmc_tpu.recon.joseph import (
        _project_one, _splat_one, make_linear_projector,
    )
    from cbctmc_tpu.recon.rooster import _cg_normal_equations

    rng = np.random.default_rng(0)
    nu, nv = args.nu, args.nv
    shape = tuple(args.shape)
    n_proj = args.n_projections
    geometry = ConeBeamGeometry(
        n_pixels_u=nu, n_pixels_v=nv,
        pixel_size_u=0.388 * 4, pixel_size_v=0.388 * 4,
    )
    grid = VolumeGrid(shape=shape, spacing=(args.spacing,) * 3)
    angles = np.linspace(0.0, 360.0, n_proj, endpoint=False)
    projections = rng.random((n_proj, nv, nu), np.float32)

    spacing = np.asarray(grid.spacing, np.float64)
    origin = grid.origin_or_centered()
    sources = geometry.source_positions(angles)
    dirs = geometry.beam_directions(angles)
    e_us = geometry.u_axes(angles)
    pixel_u = jnp.asarray(geometry.u_coordinates(), jnp.float32)
    pixel_v = jnp.asarray(geometry.v_coordinates(), jnp.float32)
    step_mm = 0.7 * float(spacing.min())
    max_path = float(np.linalg.norm((np.asarray(shape) - 1) * spacing))
    n_steps = int(np.ceil(max_path / step_mm)) + 1
    print(f"shapes: detector {nv}x{nu}, volume {shape}, "
          f"n_steps {n_steps}, chunk {args.proj_chunk}", flush=True)

    vol = jnp.asarray(rng.random(shape, np.float32))
    origin_j = jnp.asarray(origin, jnp.float32)
    spacing_j = jnp.asarray(spacing, jnp.float32)
    e_v = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    det_center0 = sources[0] + dirs[0] * geometry.sdd

    def stage(name, fn):
        if args.stages and name not in args.stages:
            return
        print(f"--- {name} start", flush=True)
        t0 = time.monotonic()
        out = fn()
        s = float(np.asarray(jnp.sum(out)))  # forced host readback
        print(f"{name} OK {time.monotonic() - t0:.1f}s sum={s:.6g}",
              flush=True)

    stage("fdk", lambda: jnp.asarray(
        fdk_reconstruct(projections, geometry, angles, grid=grid)))

    stage("forward_one", lambda: _project_one(
        vol, origin_j, spacing_j,
        jnp.asarray(sources[0], jnp.float32),
        jnp.asarray(det_center0, jnp.float32),
        jnp.asarray(e_us[0], jnp.float32), e_v,
        pixel_u, pixel_v, n_steps=n_steps, step_mm=jnp.float32(step_mm),
    ))

    stage("splat_one", lambda: _splat_one(
        jnp.asarray(projections[0]), shape, origin_j, spacing_j,
        jnp.asarray(sources[0], jnp.float32),
        jnp.asarray(det_center0, jnp.float32),
        jnp.asarray(e_us[0], jnp.float32), e_v,
        pixel_u, pixel_v, n_steps=n_steps, step_mm=jnp.float32(step_mm),
    ))

    _proj = make_linear_projector(
        shape, origin, spacing, pixel_u, pixel_v,
        np.array([0.0, 0.0, 1.0]), n_steps=n_steps, step_mm=step_mm,
    )
    k = args.proj_chunk
    det_centers = sources[:k] + dirs[:k] * geometry.sdd
    srcs = jnp.asarray(sources[:k], jnp.float32)
    dets = jnp.asarray(det_centers, jnp.float32)
    eus = jnp.asarray(e_us[:k], jnp.float32)

    stage("vmap_forward", lambda: jax.vmap(
        lambda a, c, u_: _proj(vol, a, c, u_))(srcs, dets, eus))

    def vmap_pair():
        def loss(v):
            fp = jax.vmap(lambda a, c, u_: _proj(v, a, c, u_))(srcs, dets, eus)
            return jnp.sum(fp * fp)
        return jax.grad(loss)(vol)

    stage("vmap_adjoint", vmap_pair)

    def cg():
        b = jnp.asarray(projections[:k])
        w = jnp.ones((k,), jnp.float32)

        def forward(v):
            return jax.vmap(lambda a, c, u_: _proj(v, a, c, u_))(
                srcs, dets, eus)

        return _cg_normal_equations(forward, vol, b, w, args.cg_iterations)

    stage("cg", cg)

    print("all stages completed", flush=True)


if __name__ == "__main__":
    main()
