"""4D end-to-end demo at reduced statistics: synthetic CIRS thorax with a
moving soft-tissue insert -> 4D-CT phase volumes -> correspondence model
(demons registration + Wilms-2014 fit) -> per-projection warped MC
simulation -> 4D forward projection -> ROOSTER reconstruction -> motion
recovery metric.

This exercises the full 4D chain of the reference outside unit tests
(reference workflow: scripts/run_mc_simulations.py:245-587 and
scripts/create_cirs_phantom_4d.py), scaled to a single-chip budget:
2 mm thorax grid, 72 projections (one ~4.8 s breathing cycle at 15 fps),
2e7 histories/view. The recorded deliverable is the recovered
superior-inferior insert trajectory across the ROOSTER phase bins vs the
imposed analytic motion.

Usage (TPU):
    python scripts/run_4d_demo.py --output-folder runs/4d_demo
"""

import json
import os
import sys
import time

# the demo's ROOSTER step has crashed the TPU worker asynchronously; keep
# per-stage sync readbacks on so a recurrence localises to the faulting op
os.environ.setdefault("CBCTMC_ROOSTER_SYNC", "1")
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click


@click.command()
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-projections", type=int, default=72)
@click.option("--n-histories", type=float, default=2e7)
@click.option("--air-histories", type=float, default=1e9)
@click.option("--amplitude-mm", type=float, default=20.0)
@click.option("--n-phases", type=int, default=10)
@click.option("--quantization", type=int, default=5)
@click.option("--n-lanes", type=int, default=None,
              help="override the sweep-winner lane count")
@click.option("--rooster-iterations", type=int, default=4,
              help="ROOSTER outer iterations (reference production: 10; "
                   "the demo's centroid-trajectory metric converges by ~4 "
                   "from the FDK warm start)")
@click.option("--rooster-cg-iterations", type=int, default=2,
              help="CG sub-iterations per data term (reference: 4)")
@click.option("--skip-fp", is_flag=True,
              help="skip the density_fp_4d forward projection (speedup "
                   "guidance channel; not needed for the recon deliverable)")
@click.option("--rooster-phases", type=int, default=5,
              help="ROOSTER phase bins (reference production: 10; 72 "
                   "demo projections give ~14 soft-assigned views/bin at 5)")
def main(output_folder, n_projections, n_histories, air_histories,
         amplitude_mm, n_phases, quantization, n_lanes, skip_fp,
         rooster_iterations, rooster_cg_iterations, rooster_phases):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    import numpy as np

    from cbctmc_tpu.engine.simulate import SimulationParameters
    from cbctmc_tpu.engine.transport import EngineConfig, production_engine_config
    from cbctmc_tpu.geometry.phantoms import CIRSPhantomGeometry
    from cbctmc_tpu.pipeline.correspondence import CorrespondenceModel
    from cbctmc_tpu.pipeline.respiratory import RespiratorySignal
    from cbctmc_tpu.pipeline.simulation import (
        MCSimulation4D,
        _write_projection_stack,
    )
    from cbctmc_tpu.pipeline.reconstruction import (
        load_projection_stack_for_recon,
        reconstruct_4d,
    )
    from cbctmc_tpu.utils.logging import init_fancy_logging

    init_fancy_logging()
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)

    spacing = 2.0
    shape = (176, 130, 72)
    insert_center = (119, 70, 36)  # reference centre (238,141,71) at 2 mm

    t0 = time.monotonic()
    base = CIRSPhantomGeometry.synthetic_thorax(
        shape=shape, image_spacing=(spacing,) * 3
    ).place_insert(insert_center=insert_center)
    print(f"thorax built ({time.monotonic()-t0:.0f}s)", flush=True)

    # ------------------------------------------------------------------
    # analytic respiratory motion: superior-inferior displacement of the
    # right-lung region, Gaussian envelope around the insert, amplitude
    # proportional to the respiratory amplitude signal (a stand-in for the
    # reference's CT-derived 4D CIRS series, create_cirs_phantom_4d.py)
    amp_vox = amplitude_mm / spacing
    idx = np.indices(shape, dtype=np.float32)
    envelope = np.exp(
        -(((idx[0] - insert_center[0]) / 40.0) ** 2
          + ((idx[1] - insert_center[1]) / 40.0) ** 2
          + ((idx[2] - insert_center[2]) / 30.0) ** 2)
    )

    def motion_dvf(amplitude):
        """Pull-sampling displacement field moving the insert inferior by
        `amplitude` (fraction of amp_vox) along +z."""
        dvf = np.zeros((3, *shape), np.float32)
        dvf[2] = -amplitude * amp_vox * envelope
        return dvf

    # 4D-CT phase series over one cycle (what a 4D CT delivers)
    phase_amp = np.sin(np.pi * np.arange(n_phases) / n_phases) ** 4
    phase_damp = np.gradient(phase_amp)
    phases = []
    for p in range(n_phases):
        phases.append(base.warp(motion_dvf(phase_amp[p])))
    phase_images = np.stack([g.densities for g in phases])
    print(f"{n_phases} phase volumes built ({time.monotonic()-t0:.0f}s)",
          flush=True)

    # measured ground truth: insert centroid per phase (soft-tissue insert
    # is the densest structure in the right lung box)
    def insert_centroid_z(vol, threshold=0.9):
        box = vol[insert_center[0]-20:insert_center[0]+20,
                  insert_center[1]-20:insert_center[1]+20, :]
        mask = box > threshold
        zs = np.nonzero(mask)[2]
        return float(zs.mean()) if zs.size else float("nan")

    truth_z = [insert_centroid_z(img) for img in phase_images]

    # ------------------------------------------------------------------
    # correspondence model: demons registration of each phase to the
    # reference phase + Wilms OLS fit on (amplitude, d/dt amplitude)
    signals = np.stack([phase_amp, phase_damp])
    t1 = time.monotonic()
    cached = sorted(output_folder.glob("correspondence_model.pkl_*.pkl"))
    if cached:
        # re-registering costs ~10 min of device time; the demo phantom is
        # deterministic for fixed options, so a cached fit is exact
        model = CorrespondenceModel.load(cached[-1])
        model_path = cached[-1]
        print(f"correspondence model loaded from cache ({cached[-1].name})",
              flush=True)
    else:
        model = CorrespondenceModel.build_default(
            images=phase_images, signals=signals, reference_phase=2,
        )
        model_path = model.save(output_folder / "correspondence_model.pkl.gz")
        print(f"correspondence model fitted ({time.monotonic()-t1:.0f}s)",
              flush=True)

    # respiratory signal for the scan: one sin^4 cycle over the scan
    total_seconds = n_projections / 15.0
    signal = RespiratorySignal.create_sin4(
        total_seconds=total_seconds, period=total_seconds,
        sampling_frequency=25.0,
    )
    signal.save(output_folder / "signal.pkl.gz")

    # ------------------------------------------------------------------
    # 4D MC simulation: the reference phase-2 geometry is warped to each
    # quantised motion state through the correspondence model
    reference_geometry = phases[2]
    sim4d = MCSimulation4D(
        correspondence_model=model,
        geometry=reference_geometry,
        parameters=SimulationParameters(
            n_histories=int(n_histories),
            n_projections=n_projections,
            angle_between_projections=360.0 / n_projections,
        ),
        engine_config=production_engine_config(
        **({'n_lanes': n_lanes} if n_lanes else {})),
        air_n_histories=int(air_histories),
    )
    sim_folder = output_folder / "simulation"
    t2 = time.monotonic()
    sim4d.run_simulation(
        respiratory_signal=signal,
        respiratory_signal_quantization=quantization,
        output_folder=sim_folder,
    )
    print(f"4D MC simulation done ({time.monotonic()-t2:.0f}s)", flush=True)

    # 4D forward projection of the warped densities (density_fp_4d, the
    # speedup guidance channel; reference: run_mc_simulations.py:491-556)
    from cbctmc_tpu.cli import _forward_project_geometry_4d

    t3 = time.monotonic()
    if skip_fp:
        print("density_fp_4d skipped (--skip-fp)", flush=True)
    elif (sim_folder / "density_fp_4d.mha").is_file():
        print("density_fp_4d.mha present; skipping", flush=True)
    else:
        _forward_project_geometry_4d(sim_folder, n_projections=n_projections)
        print(f"density_fp_4d done ({time.monotonic()-t3:.0f}s)", flush=True)

    # ------------------------------------------------------------------
    # ROOSTER 4D reconstruction on a 4x-binned detector grid
    stack, meta = load_projection_stack_for_recon(
        sim_folder / "projections_total_normalized.mha"
    )
    f = 4
    v, u = stack.shape[1] // f * f, stack.shape[2] // f * f
    binned = stack[:, :v, :u].reshape(
        stack.shape[0], v // f, f, u // f, f
    ).mean(axis=(2, 4))
    binned_path = sim_folder / "projections_total_normalized_bin4.mha"
    _write_projection_stack(binned, binned_path, (0.388 * f, 0.388 * f))

    amplitude = np.loadtxt(sim_folder / "signal.txt")[:, 0]
    t4 = time.monotonic()
    from cbctmc_tpu.recon.rooster import RoosterParameters

    rooster_params = RoosterParameters(
        n_phases=rooster_phases,
        n_iterations=rooster_iterations,
        n_data_subiterations=rooster_cg_iterations,
    )
    recon_path = reconstruct_4d(
        binned_path,
        amplitude_signal=amplitude,
        output_folder=output_folder / "reconstructions",
        dimension=(180, 80, 180),
        spacing=(2.0, 2.0, 2.0),
        n_projections=n_projections,
        parameters=rooster_params,
    )
    print(f"ROOSTER 4D recon done ({time.monotonic()-t4:.0f}s)", flush=True)

    # ------------------------------------------------------------------
    # motion recovery: per ROOSTER phase bin, the centroid of the
    # difference from the time-mean volume tracks the moving insert; the
    # axis with the largest span self-identifies the motion direction (no
    # frame-convention assumptions)
    from cbctmc_tpu.analysis.binning import scale_signal_to_phase_for_rooster
    from cbctmc_tpu.utils.io import read_image

    vol4d, _ = read_image(recon_path)  # [x, y, z, phase]
    n_bins = vol4d.shape[-1]

    # map the imposed signal to the recon phase bins: mean amplitude of the
    # projections assigned to each bin (same phase mapping as the recon)
    phase_signal = scale_signal_to_phase_for_rooster(amplitude)
    bin_of = np.minimum((phase_signal * n_bins).astype(int), n_bins - 1)
    imposed = [
        float(amplitude[bin_of == b].mean()) if np.any(bin_of == b) else np.nan
        for b in range(n_bins)
    ]

    mean_vol = np.nanmean(vol4d, axis=-1)
    coms = []  # [n_bins, 3] centroid of the positive difference
    for b in range(n_bins):
        diff = np.clip(vol4d[..., b] - mean_vol, 0.0, None)
        w = diff.sum()
        if w <= 0:
            coms.append([np.nan] * 3)
            continue
        coms.append([
            float((diff.sum(axis=tuple(a for a in range(3) if a != ax))
                   * np.arange(diff.shape[ax])).sum() / w)
            for ax in range(3)
        ])
    coms = np.asarray(coms)  # voxels (2 mm)

    imposed_a = np.asarray(imposed)
    spans = np.nanmax(coms, axis=0) - np.nanmin(coms, axis=0)
    motion_axis = int(np.nanargmax(spans))
    recovered_a = coms[:, motion_axis]
    ok = ~(np.isnan(imposed_a) | np.isnan(recovered_a))
    corr = (
        float(np.corrcoef(imposed_a[ok], recovered_a[ok])[0, 1])
        if ok.sum() > 2 else None
    )
    span_mm = float(spans[motion_axis] * 2.0)

    report = {
        "n_projections": n_projections,
        "n_histories_per_projection": float(n_histories),
        "amplitude_mm": amplitude_mm,
        "quantization_bins": quantization,
        "unique_motion_states": len(
            RespiratorySignal.get_unique_signals(
                RespiratorySignal.quantize_signal(
                    signal.resample(15.0).signal[:n_projections], quantization
                ),
                RespiratorySignal.quantize_signal(
                    signal.resample(15.0).dt_signal[:n_projections], quantization
                ),
            )
        ),
        "phase_truth_centroid_z_vox": truth_z,
        "imposed_amplitude_per_bin": imposed,
        "recovered_centroid_per_bin_vox": coms.tolist(),
        "motion_axis": motion_axis,
        "amplitude_position_correlation": corr,
        "recovered_motion_span_mm": span_mm,
        "rooster_parameters": {
            "n_phases": rooster_phases,
            "n_iterations": rooster_iterations,
            "n_data_subiterations": rooster_cg_iterations,
            "reference_production": {"n_phases": 10, "n_iterations": 10,
                                     "n_data_subiterations": 4},
        },
        "correspondence_model": str(model_path),
        "reconstruction": str(recon_path),
    }
    with open(output_folder / "4d_demo.json", "w") as fjson:
        json.dump(report, fjson, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
