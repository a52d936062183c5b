"""4D ROOSTER reconstruction: motion-binned iterative recon with spatial and
temporal total-variation regularisation.

Replaces the reference's Docker-shipped ``rtkfourdrooster`` app (invocation:
cbctmc/reconstruction/reconstruction.py:72-125 with niter=10, cgiter=4,
tviter=10, gamma_time=2e-4, gamma_space=7e-5). Algorithm after Mory et al.
2014: alternate

1. data-fidelity updates of each respiratory-phase volume against its
   projections: conjugate-gradient on the weighted normal equations
   (rtk "cgiter", reference reconstruction.py:105-121) with an EXACTLY
   matched projector/adjoint pair - the adjoint is the analytic transpose
   of the ray-marching forward projector (a trilinear "splat"
   backprojection along the same march, joseph.make_linear_projector;
   verified against AD and by the <Ax,y>=<x,A^T y> identity in
   tests/test_rooster.py). Reverse-mode AD through the step loop computes
   the same transpose but stores O(rays * n_steps) scan residuals, which
   is tens of GB at 4D-demo scale. A Landweber fallback with the
   unmatched voxel-driven backprojector is kept for comparison,
2. spatial TV denoising of every phase (Chambolle projection algorithm),
3. temporal TV denoising along the phase axis (cyclic).

Projections are soft-assigned to phase bins with linear interpolation
weights from the per-projection phase signal in [0, 1), like RTK's
interpolation matrix.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from pathlib import Path
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cbctmc_tpu.recon.fdk import fdk_reconstruct
from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid
from cbctmc_tpu.recon.joseph import _project_one, make_linear_projector

logger = logging.getLogger(__name__)

def _sync_debug() -> bool:
    """Per-stage host-readback instrumentation: localises an async
    TPU-worker crash to the op group that triggered it (the runtime
    otherwise surfaces the fault only at the next materialisation, many
    stages later)."""
    return bool(os.environ.get("CBCTMC_ROOSTER_SYNC"))


def phase_interpolation_weights(
    phase_signal: np.ndarray, n_phases: int
) -> np.ndarray:
    """Linear interpolation weights [n_projections, n_phases] for a cyclic
    phase in [0, 1)."""
    phase = np.asarray(phase_signal, np.float64) % 1.0
    pos = phase * n_phases
    lo = np.floor(pos).astype(int) % n_phases
    hi = (lo + 1) % n_phases
    frac = pos - np.floor(pos)
    weights = np.zeros((len(phase), n_phases))
    weights[np.arange(len(phase)), lo] = 1.0 - frac
    weights[np.arange(len(phase)), hi] += frac
    return weights


def _spatial_tv_chambolle(volume: jnp.ndarray, weight: float, n_iter: int):
    """Chambolle 2004 projection algorithm for 3D TV denoising."""

    def grad(u):
        gx = jnp.diff(u, axis=0, append=u[-1:])
        gy = jnp.diff(u, axis=1, append=u[:, -1:])
        gz = jnp.diff(u, axis=2, append=u[:, :, -1:])
        return jnp.stack([gx, gy, gz])

    def div(p):
        px, py, pz = p[0], p[1], p[2]
        dx = px - jnp.roll(px, 1, axis=0)
        dx = dx.at[0].set(px[0]).at[-1].set(-px[-2])
        dy = py - jnp.roll(py, 1, axis=1)
        dy = dy.at[:, 0].set(py[:, 0]).at[:, -1].set(-py[:, -2])
        dz = pz - jnp.roll(pz, 1, axis=2)
        dz = dz.at[:, :, 0].set(pz[:, :, 0]).at[:, :, -1].set(-pz[:, :, -2])
        return dx + dy + dz

    tau = 0.25 / 2.0

    def body(_, p):
        g = grad(div(p) - volume / weight)
        norm = jnp.sqrt(jnp.sum(g * g, axis=0, keepdims=True))
        return (p + tau * g) / (1.0 + tau * norm)

    p0 = jnp.zeros((3, *volume.shape), volume.dtype)
    p = jax.lax.fori_loop(0, n_iter, body, p0)
    return volume - weight * div(p)


def _temporal_tv(volumes: jnp.ndarray, weight: float, n_iter: int):
    """1-D TV denoising along the (cyclic) phase axis via fixed-point
    iterations of the dual problem."""
    tau = 0.25

    def body(_, p):
        div_p = p - jnp.roll(p, 1, axis=0)
        g = jnp.roll(div_p - volumes / weight, -1, axis=0) - (
            div_p - volumes / weight
        )
        p = (p + tau * g) / (1.0 + tau * jnp.abs(g))
        return p

    p0 = jnp.zeros_like(volumes)
    p = jax.lax.fori_loop(0, n_iter, body, p0)
    return volumes - weight * (p - jnp.roll(p, 1, axis=0))


@dataclasses.dataclass(frozen=True)
class RoosterParameters:
    n_phases: int = 10
    n_iterations: int = 10  # outer iterations (rtk "niter")
    n_data_subiterations: int = 4  # rtk "cgiter"
    n_tv_iterations: int = 10  # rtk "tviter"
    gamma_space: float = 7e-5
    gamma_time: float = 2e-4
    data_step_size: float = 0.5  # Landweber fallback only
    # "cg": conjugate gradient with the linear-transpose adjoint (the
    # reference's data term); "landweber": gradient steps with the
    # voxel-driven backprojector
    data_method: str = "cg"
    # "host": one device program per operator application (CG loop runs on
    # the host; robust — a fused CG is the largest XLA program in the repo
    # and worker-side failures of it are unattributable); "fused": the
    # whole CG update as a single jitted program
    cg_dispatch: str = "host"
    # "shearwarp": the MXU matmul-factorised projector pair
    # (recon/shearwarp.py) — no data-dependent gathers, so it cannot hit
    # the TPU gather-chain kernel fault, and it is 1-2 orders of magnitude
    # faster than the ray march at production view counts; "joseph": the
    # ray-marched pair (reference-identical discretisation, used by tests
    # and as fallback for grids the shear-warp cannot express)
    projector: str = "shearwarp"


def _cg_normal_equations(forward, vol0, b, w, n_iter: int):
    """Minimise ||sqrt(w) (A x - b)||^2 with conjugate gradient on the
    normal equations A^T W A x = A^T W b. ``forward`` must be linear in the
    volume and carry an exact transpose as its VJP (the ray-marching
    projector registers the analytic splat adjoint via custom_vjp —
    joseph.make_linear_projector; plain AD of the step loop would store
    O(rays * n_steps) residuals)."""
    _, vjp_fn = jax.vjp(forward, vol0)

    def at(y):
        return vjp_fn(y)[0]

    w3 = w[:, None, None]

    def ata(x):
        return at(w3 * forward(x))

    rhs = at(w3 * b)
    eps = jnp.float32(1e-30)

    x = vol0
    r = rhs - ata(x)
    p = r
    rs = jnp.vdot(r, r)
    for _ in range(n_iter):
        ap = ata(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, ap), eps)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, eps)) * p
        rs = rs_new
    return x


def rooster_reconstruct(
    projections: np.ndarray,  # [P, nv, nu] line integrals
    geometry: ConeBeamGeometry,
    angles_deg: Sequence[float],
    phase_signal: np.ndarray,  # [P] in [0, 1)
    grid: VolumeGrid | None = None,
    parameters: RoosterParameters | None = None,
    water_precorrection: Sequence[float] | None = None,
    checkpoint_path: "str | None" = None,
) -> np.ndarray:
    """Returns the 4D volume [n_phases, x, y, z].

    ``checkpoint_path`` (``.npz``) makes the run resumable: the volumes are
    materialised (host readback — also bounding the device async queue) and
    saved after every outer iteration, and a restart continues from the
    last completed iteration if the recorded shape/parameters match. This
    is the recon-side analogue of the simulation's per-projection resume
    (the reference relies on rtkfourdrooster being fast enough to rerun;
    on a preemptible TPU worker the checkpoint is the honest equivalent)."""
    grid = grid or VolumeGrid()
    par = parameters or RoosterParameters()

    projections = np.asarray(projections, np.float32)
    if water_precorrection is not None:
        from cbctmc_tpu.recon.fdk import apply_water_precorrection

        projections = np.asarray(
            apply_water_precorrection(jnp.asarray(projections), water_precorrection)
        )

    weights = phase_interpolation_weights(phase_signal, par.n_phases)
    angles = np.asarray(angles_deg, np.float64)

    ckpt_key = repr((tuple(grid.shape), dataclasses.astuple(par),
                     projections.shape))
    start_iteration = 0
    volumes = None
    if checkpoint_path is not None:
        cp = Path(checkpoint_path)
        if cp.is_file():
            saved = np.load(cp, allow_pickle=False)
            if str(saved.get("key", "")) == ckpt_key:
                start_iteration = int(saved["outer_done"])
                volumes = jnp.asarray(saved["volumes"])
                logger.info(
                    "ROOSTER resume: %d/%d outer iterations from %s",
                    start_iteration, par.n_iterations, cp,
                )
            else:
                logger.warning(
                    "ROOSTER checkpoint %s does not match this run; ignoring",
                    cp,
                )

    if volumes is None:
        # initialise every phase with the phase-weighted FDK (common warm
        # start)
        logger.info("ROOSTER init: FDK warm start")
        init = fdk_reconstruct(projections, geometry, angles, grid=grid)
        volumes = jnp.tile(
            jnp.asarray(init, jnp.float32)[None], (par.n_phases, 1, 1, 1)
        )
        if _sync_debug():
            logger.info("ROOSTER sync: FDK warm start done, sum=%.6g",
                        float(np.asarray(jnp.sum(volumes))))

    spacing = np.asarray(grid.spacing, np.float64)
    origin = grid.origin_or_centered()
    sources = geometry.source_positions(angles)
    dirs = geometry.beam_directions(angles)
    e_us = geometry.u_axes(angles)
    pixel_u = jnp.asarray(geometry.u_coordinates(), jnp.float32)
    pixel_v = jnp.asarray(geometry.v_coordinates(), jnp.float32)
    step_mm = 0.7 * float(spacing.min())
    # rays march from their per-ray volume entry (joseph._ray_box_entry):
    # the step budget is the support-box diagonal, not source-to-detector
    max_path = float(np.linalg.norm((np.asarray(grid.shape) - 1) * spacing))
    n_steps = int(np.ceil(max_path / step_mm)) + 1

    from cbctmc_tpu.recon.fdk import _backproject

    u = geometry.u_coordinates()
    v = geometry.v_coordinates()

    def data_update(volume: jnp.ndarray, proj_indices: np.ndarray,
                    w: np.ndarray) -> jnp.ndarray:
        """One Landweber pass of a phase volume over its projections."""
        residual = np.empty(
            (len(proj_indices), geometry.n_pixels_v, geometry.n_pixels_u),
            np.float32,
        )
        for j, pi in enumerate(proj_indices):
            det_center = sources[pi] + dirs[pi] * geometry.sdd
            fp = _project_one(
                volume,
                jnp.asarray(origin, jnp.float32),
                jnp.asarray(spacing, jnp.float32),
                jnp.asarray(sources[pi], jnp.float32),
                jnp.asarray(det_center, jnp.float32),
                jnp.asarray(e_us[pi], jnp.float32),
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                pixel_u, pixel_v,
                n_steps=n_steps, step_mm=jnp.float32(step_mm),
            )
            residual[j] = w[j] * (np.asarray(fp) - projections[pi])

        # unfiltered backprojection of the residual, normalised by the
        # path length through the volume (SART-style weighting)
        bp = _backproject(
            jnp.asarray(residual),
            jnp.asarray(sources[proj_indices], jnp.float32),
            jnp.asarray(dirs[proj_indices], jnp.float32),
            jnp.asarray(e_us[proj_indices], jnp.float32),
            jnp.asarray([u[0], 1.0 / geometry.pixel_size_u], jnp.float32),
            jnp.asarray([v[0], 1.0 / geometry.pixel_size_v], jnp.float32),
            tuple(grid.shape),
            jnp.asarray(origin, jnp.float32),
            jnp.asarray(grid.spacing, jnp.float32),
            jnp.float32(geometry.sad),
            jnp.float32(geometry.sdd),
            jnp.float32(1.0 / max(len(proj_indices), 1)),
        )
        path_norm = float(np.linalg.norm(np.asarray(grid.shape) * spacing))
        return volume - par.data_step_size * bp / path_norm

    e_v = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    origin_j = jnp.asarray(origin, jnp.float32)
    spacing_j = jnp.asarray(spacing, jnp.float32)

    # pad every phase's projection set to a common size (weight 0) so one
    # compiled CG program serves all phases; the padded count is a multiple
    # of the projection chunk so the chunked forward tiles evenly
    phase_sets = [np.where(weights[:, ph] > 1e-6)[0] for ph in range(par.n_phases)]
    max_sel = max((len(x) for x in phase_sets), default=0)
    # bound GATHER WORK per compiled device program, not just rays: the TPU
    # runtime kernel-faults on long gather chains — measured working point
    # ~4e8 ray-step gathers per program (project_forward's row tiling),
    # reproducible crash at ~1.2e9 (round-4 ROOSTER CG, probe_recon_r5
    # stage 4). Budget each projection program to ~1.5e8 ray-steps.
    n_rays = geometry.n_pixels_v * geometry.n_pixels_u
    gather_budget = 150_000_000
    proj_chunk = max(
        1, min(max_sel if max_sel else 1,
               int(gather_budget // max(n_rays * n_steps, 1)) or 1)
    )
    max_sel = -(-max_sel // proj_chunk) * proj_chunk

    # forward operator with the analytic splat adjoint (AD through the
    # step-marched projector stores O(rays * steps) scan residuals — tens
    # of GB at 4D scale)
    _proj = make_linear_projector(
        tuple(grid.shape), origin, spacing, pixel_u, pixel_v,
        np.array([0.0, 0.0, 1.0]), n_steps=n_steps, step_mm=step_mm,
    )

    def _forward(v, srcs, dets, eus):
        def fchunk(args):
            s, d, e = args
            return jax.vmap(lambda a, c, u_: _proj(v, a, c, u_))(s, d, e)

        out = jax.lax.map(
            fchunk,
            (
                srcs.reshape(-1, proj_chunk, 3),
                dets.reshape(-1, proj_chunk, 3),
                eus.reshape(-1, proj_chunk, 3),
            ),
        )
        return out.reshape(max_sel, geometry.n_pixels_v,
                           geometry.n_pixels_u)

    @partial(jax.jit, static_argnames=())
    def cg_update(vol, srcs, dets, eus, b, w):
        return _cg_normal_equations(
            lambda v: _forward(v, srcs, dets, eus), vol, b, w,
            par.n_data_subiterations,
        )

    # host-dispatched CG: numerically identical to cg_update but issues
    # one device program per operator application instead of fusing the
    # whole CG loop — (n_iter+2) x (forward + adjoint) chunk loops in a
    # single XLA program is the largest computation in the repo, and
    # worker-side failures of a giant program are unrecoverable and
    # unattributable (the async runtime surfaces them much later)
    @partial(jax.jit, static_argnames=())
    def ata_apply(v, srcs, dets, eus, w):
        fx, vjp_fn = jax.vjp(lambda x: _forward(x, srcs, dets, eus), v)
        return vjp_fn(w[:, None, None] * fx)[0]

    @partial(jax.jit, static_argnames=())
    def adjoint_apply(v, y, srcs, dets, eus, w):
        _, vjp_fn = jax.vjp(lambda x: _forward(x, srcs, dets, eus), v)
        return vjp_fn(w[:, None, None] * y)[0]

    def cg_update_host(vol, srcs, dets, eus, b, w):
        eps = jnp.float32(1e-30)
        x = vol
        rhs = adjoint_apply(vol, b, srcs, dets, eus, w)
        r = rhs - ata_apply(x, srcs, dets, eus, w)
        p = r
        rs = jnp.vdot(r, r)
        for it in range(par.n_data_subiterations):
            ap = ata_apply(p, srcs, dets, eus, w)
            alpha = rs / jnp.maximum(jnp.vdot(p, ap), eps)
            x = x + alpha * p
            r = r - alpha * ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / jnp.maximum(rs, eps)) * p
            rs = rs_new
            if _sync_debug():
                logger.info("ROOSTER sync: CG subiteration %d done, rs=%.6g",
                            it + 1, float(np.asarray(rs)))
        return x

    # --- shear-warp data term: the production path. Per phase, a matched
    # forward/transpose pair of dense MXU programs over that phase's views
    # (recon/shearwarp.py); the CG loop runs on the host with a readback
    # per subiteration, so programs stay small and attributable.
    sw_projectors = None
    if par.data_method == "cg" and par.projector == "shearwarp":
        from cbctmc_tpu.recon.shearwarp import ShearWarpProjector

        try:
            sw_projectors = [
                ShearWarpProjector(
                    tuple(grid.shape), origin, spacing, geometry,
                    angles[phase_sets[ph]],
                )
                for ph in range(par.n_phases)
            ]
        except ValueError as exc:
            logger.warning(
                "shear-warp projector unavailable for this grid (%s); "
                "falling back to the ray-marched pair", exc,
            )

    def cg_update_shearwarp(ph, vol, b, w):
        P = sw_projectors[ph]
        w3 = jnp.asarray(w, jnp.float32)[:, None, None]
        b = jnp.asarray(b, jnp.float32)

        def ata(x):
            return P.transpose(w3 * P.forward(x))

        eps = jnp.float32(1e-30)
        x = vol
        r = P.transpose(w3 * b) - ata(x)
        p = r
        rs = jnp.vdot(r, r)
        for it in range(par.n_data_subiterations):
            ap = ata(p)
            alpha = rs / jnp.maximum(jnp.vdot(p, ap), eps)
            x = x + alpha * p
            r = r - alpha * ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / jnp.maximum(rs, eps)) * p
            rs = rs_new
            # readback every subiteration: bounds the async queue AND
            # detects stagnation early
            rs_host = float(np.asarray(rs))
            if _sync_debug():
                logger.info("ROOSTER sync: CG(sw) subiteration %d rs=%.6g",
                            it + 1, rs_host)
            if not np.isfinite(rs_host):
                raise FloatingPointError(
                    f"ROOSTER CG diverged (rs={rs_host}) at phase {ph}"
                )
        return x

    for outer in range(start_iteration, par.n_iterations):
        new_volumes = []
        for phase in range(par.n_phases):
            w_all = weights[:, phase]
            proj_indices = phase_sets[phase]
            vol = volumes[phase]
            if len(proj_indices) and sw_projectors is not None:
                vol = cg_update_shearwarp(
                    phase, vol, projections[proj_indices],
                    w_all[proj_indices],
                )
            elif len(proj_indices) and par.data_method == "cg":
                sel = np.zeros(max_sel, np.int64)
                sel[: len(proj_indices)] = proj_indices
                w_sel = np.zeros(max_sel, np.float32)
                w_sel[: len(proj_indices)] = w_all[proj_indices]
                det_centers = sources[sel] + dirs[sel] * geometry.sdd
                update = (cg_update_host if par.cg_dispatch == "host"
                          else cg_update)
                vol = update(
                    vol,
                    jnp.asarray(sources[sel], jnp.float32),
                    jnp.asarray(det_centers, jnp.float32),
                    jnp.asarray(e_us[sel], jnp.float32),
                    jnp.asarray(projections[sel], jnp.float32),
                    jnp.asarray(w_sel),
                )
            elif len(proj_indices):
                for _ in range(par.n_data_subiterations):
                    vol = data_update(vol, proj_indices, w_all[proj_indices])
            if _sync_debug():
                logger.info(
                    "ROOSTER sync: outer %d phase %d done, sum=%.6g",
                    outer + 1, phase, float(np.asarray(jnp.sum(vol))),
                )
            new_volumes.append(vol)
        volumes = jnp.stack(new_volumes)

        if par.gamma_space > 0:
            volumes = jax.vmap(
                lambda v: _spatial_tv_chambolle(
                    v, par.gamma_space, par.n_tv_iterations
                )
            )(volumes)
            if _sync_debug():
                logger.info("ROOSTER sync: outer %d spatial TV done, sum=%.6g",
                            outer + 1, float(np.asarray(jnp.sum(volumes))))
        if par.gamma_time > 0 and par.n_phases > 1:
            volumes = _temporal_tv(volumes, par.gamma_time, par.n_tv_iterations)
            if _sync_debug():
                logger.info("ROOSTER sync: outer %d temporal TV done, sum=%.6g",
                            outer + 1, float(np.asarray(jnp.sum(volumes))))
        if checkpoint_path is not None:
            # host readback: bounds the device async queue (a crashed TPU
            # worker otherwise surfaces only at the final materialisation)
            # and persists progress
            host = np.asarray(volumes)
            cp = Path(checkpoint_path)
            tmp = cp.with_suffix(".tmp.npz")
            np.savez(tmp, key=ckpt_key, outer_done=outer + 1, volumes=host)
            tmp.replace(cp)
        logger.info("ROOSTER outer iteration %d/%d done", outer + 1, par.n_iterations)

    return np.asarray(volumes)
