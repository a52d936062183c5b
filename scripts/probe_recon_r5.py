"""Round-5 recon crash probe: exercise the at-scale reconstruction programs
that killed the TPU worker in round 4 (runs/r4queue3/{acceptance,4d_demo}.log)
with synthetic data at the EXACT failing shapes, stage by stage, so a fault is
attributable to one op group.

Stages:
  1. chunked FDK at the 894-view CatPhan acceptance shapes
     (projections [894, 192, 128], grid (256, 256, 60))   <- round-4 fault #1
  2. spatial TV (Chambolle, 10 iters) at 4D-demo shapes [10, 256, 256, 60]
  3. temporal TV (10 iters) at the same shapes            <- round-4 fault #2
  4. one host-dispatched CG data update at 4D-demo shapes

Each stage prints a banner BEFORE dispatch and a checksum AFTER readback.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def banner(msg):
    print(f"[probe] {msg} @ {time.strftime('%H:%M:%S')}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from cbctmc_tpu.recon.fdk import fdk_reconstruct
    from cbctmc_tpu.recon.geometry import ConeBeamGeometry, VolumeGrid

    banner(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # --- stage 1: chunked FDK at acceptance shapes
    cb = ConeBeamGeometry(
        sad=1000.0, sdd=1500.0, n_pixels_u=128, n_pixels_v=192,
        pixel_size_u=0.776 * 4, pixel_size_v=0.776 * 4,
        detector_offset_u=-159.856,
    )
    grid = VolumeGrid(shape=(256, 256, 60), spacing=(1.0, 1.0, 1.0))
    proj = rng.normal(1.0, 0.1, (894, 192, 128)).astype(np.float32)
    angles = 270.0 + np.arange(894) * 360.0 / 894
    wpc = [0.05, 0.9, 0.02, 0.0, 0.0, 0.0]
    banner("stage 1: chunked FDK, 894 views, grid (256,256,60), WPC")
    t0 = time.time()
    vol = fdk_reconstruct(proj, cb, angles, grid=grid, water_precorrection=wpc)
    banner(f"stage 1 OK: sum={vol.sum():.6g} in {time.time() - t0:.1f}s")

    # --- stage 2+3: TV stages at 4D-demo shapes
    from cbctmc_tpu.recon.rooster import _spatial_tv_chambolle, _temporal_tv

    volumes = jnp.asarray(
        rng.normal(0.02, 0.005, (10, 256, 256, 60)).astype(np.float32)
    )
    banner("stage 2: spatial TV x10 phases, 10 iters")
    t0 = time.time()
    out = jax.vmap(lambda v: _spatial_tv_chambolle(v, 7e-5, 10))(volumes)
    s = float(np.asarray(out.sum()))
    banner(f"stage 2 OK: sum={s:.6g} in {time.time() - t0:.1f}s")

    banner("stage 3: temporal TV, 10 iters")
    t0 = time.time()
    out2 = _temporal_tv(out, 2e-4, 10)
    s = float(np.asarray(out2.sum()))
    banner(f"stage 3 OK: sum={s:.6g} in {time.time() - t0:.1f}s")

    # --- stage 4: one host-dispatched CG update at 4D-demo scale
    banner("stage 4: host-dispatched CG data update (1 phase, 90 views)")
    from cbctmc_tpu.recon.rooster import RoosterParameters, rooster_reconstruct

    par = RoosterParameters(
        n_phases=2, n_iterations=1, n_data_subiterations=2,
        n_tv_iterations=4, data_method="cg", cg_dispatch="host",
    )
    proj_small = proj[:180]
    angles_small = angles[:180]
    phase = (np.arange(180) / 90.0) % 1.0
    t0 = time.time()
    vols = rooster_reconstruct(
        proj_small, cb, angles_small, phase, grid=grid, parameters=par,
    )
    banner(f"stage 4 OK: sum={vols.sum():.6g} in {time.time() - t0:.1f}s")
    banner("ALL STAGES PASSED")


if __name__ == "__main__":
    main()
