"""Render the recorded validation artifacts as figures.

TPU-native analogue of the reference's plotting scripts
(scripts/plot_mtfs.py, scripts/generate_publication_images.py,
scripts/fit_noise.py's plot subcommand): reads the JSON records under
docs/validation/ and runs/ and writes PNGs next to them.

Usage:
    python scripts/plot_validation.py [--output-dir docs/validation/figures]
"""

import json
import sys
from pathlib import Path

import click

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def _style():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams.update({
        "figure.dpi": 130, "font.size": 9, "axes.grid": True,
        "grid.alpha": 0.3, "figure.constrained_layout.use": True,
    })
    return plt


def plot_noise_fit(path: Path, out: Path) -> bool:
    if not path.is_file():
        return False
    import numpy as np

    plt = _style()
    d = json.loads(path.read_text())
    counts = np.array([float(k) for k in d["samples"]])
    vals = list(d["samples"].values())
    # round-4 format: {count: std}; round-5: {count: {water_std: ...}}
    stds = np.array(
        [v["water_std"] if isinstance(v, dict) else v for v in vals], float
    )
    a, c = d["fit_a"], d["fit_c"]
    fig, ax = plt.subplots(figsize=(4.2, 3.2))
    n_grid = np.geomspace(counts.min() / 4, counts.max() * 4, 200)
    ax.loglog(n_grid, a / np.sqrt(n_grid) + c, "-", color="tab:blue",
              label=f"fit a/√n + c (a={a:.3g}, c={c:.3g})")
    ax.loglog(counts, stds, "o", color="tab:red", label="measured")
    ax.axhline(d["target_std"], color="k", ls="--", lw=0.8,
               label=f"Varian water std {d['target_std']:.2e}")
    # the 11-ROI optimum (the reference's headline metric); the water-only
    # solution can be floor-limited (c > target) on binned grids and is
    # then omitted rather than plotted at a meaningless 1e20
    best_roi = d.get("best_n_11roi_at_n_projections")
    if best_roi and counts.min() / 10 < best_roi < counts.max() * 100:
        ax.axvline(best_roi, color="gray", ls=":", lw=0.8,
                   label="11-ROI optimum")
    if c >= d["target_std"]:
        ax.text(0.03, 0.05, "water fit floor-limited:\nc > Varian target "
                "on this grid", transform=ax.transAxes, fontsize=6,
                color="gray")
    ax.set_xlim(counts.min() / 8, counts.max() * 30)
    ax.set_xlabel("histories / projection")
    ax.set_ylabel("water-ROI std [1/mm]")
    binning = d.get("detector_binning", 1)
    ax.set_title(f"fit-noise ({d.get('n_projections', '?')} views, "
                 f"bin-{binning} grid)")
    ax.legend(fontsize=7)
    fig.savefig(out)
    plt.close(fig)
    return True


def plot_mtf(path: Path, out: Path) -> bool:
    if not path.is_file():
        return False
    plt = _style()
    d = json.loads(path.read_text())
    freqs = sorted(float(k) for k in d["mtf"])
    vals = [d["mtf"][k] for k in (f"{f:.4f}" for f in freqs)]
    fig, ax = plt.subplots(figsize=(4.2, 3.2))
    ax.plot(freqs, vals, "o-", color="tab:blue")
    ax.set_xlabel("spatial frequency [lp/mm]")
    ax.set_ylabel("MTF (relative to largest gap)")
    ax.set_ylim(0, 1.05)
    ax.set_title(
        f"line-pair MTF ({d.get('n_histories', 0):.0e} hist x "
        f"{d.get('n_projections', '?')} views)"
    )
    fig.savefig(out)
    plt.close(fig)
    return True


def plot_acceptance(path: Path, out: Path) -> bool:
    if not path.is_file():
        return False
    import numpy as np

    plt = _style()
    d = json.loads(path.read_text())
    variant = d.get("total_own_wpc") or d.get("primary_only")
    if not isinstance(variant, dict):
        return False
    rois = [k for k, v in variant.items()
            if isinstance(v, dict) and "reference_mu" in v]
    rois.sort(key=lambda k: variant[k]["reference_mu"])
    x = np.arange(len(rois))
    meas = [variant[k]["mean"] for k in rois]
    meas_std = [variant[k]["std"] for k in rois]
    ref = [variant[k]["reference_mu"] for k in rois]
    varian = [variant[k].get("varian_mean") for k in rois]
    fig, ax = plt.subplots(figsize=(5.4, 3.4))
    ax.bar(x - 0.2, ref, 0.4, label="reference mu (63.14 keV)",
           color="tab:gray")
    ax.bar(x + 0.2, meas, 0.4, yerr=meas_std, label="measured (own WPC)",
           color="tab:blue", capsize=2)
    if all(v is not None for v in varian):
        ax.plot(x, varian, "x", color="tab:red", label="Varian scan mean")
    ax.set_xticks(x, rois, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel("mu [1/mm]")
    mare = None
    for key in ("mean_absolute_relative_error",):
        if key in variant:
            mare = variant[key]
    title = "CatPhan604 sensitometry acceptance"
    if mare is not None:
        title += f" (solid-insert MARE {100 * mare:.2f}%)"
    ax.set_title(title)
    ax.legend(fontsize=7)
    fig.savefig(out)
    plt.close(fig)
    return True


def plot_4d_motion(path: Path, out: Path) -> bool:
    """Imposed vs recovered motion trajectory across the ROOSTER phase
    bins (the 4D demo's deliverable, runs/4d_demo/4d_demo.json)."""
    if not path.is_file():
        return False
    import numpy as np

    plt = _style()
    d = json.loads(path.read_text())
    imposed = np.asarray(d.get("imposed_amplitude_per_bin", []), float)
    coms = np.asarray(d.get("recovered_centroid_per_bin_vox", []), float)
    axis = d.get("motion_axis")
    if imposed.size == 0 or coms.size == 0 or axis is None:
        return False
    rec = coms[:, axis]
    bins = np.arange(len(rec))
    # normalise both to zero-mean/unit-span for overlay (the metric is the
    # correlation + span, not absolute offsets)
    def norm(v):
        v = v - np.nanmean(v)
        s = np.nanmax(v) - np.nanmin(v)
        return v / s if s > 0 else v
    fig, ax = plt.subplots(figsize=(5.0, 3.2))
    ax.plot(bins, norm(imposed), "o-", label="imposed signal (bin mean)",
            color="tab:gray")
    ax.plot(bins, norm(rec), "s-", label="recovered insert centroid",
            color="tab:blue")
    corr = d.get("amplitude_position_correlation")
    span = d.get("recovered_motion_span_mm")
    title = "4D demo: motion recovery across ROOSTER bins"
    sub = []
    if corr is not None:
        sub.append(f"corr {corr:.3f}")
    if span is not None:
        sub.append(f"span {span:.1f} mm (imposed {d.get('amplitude_mm')} mm)")
    if sub:
        title += "\n" + ", ".join(sub)
    ax.set_title(title, fontsize=9)
    ax.set_xlabel("phase bin")
    ax.set_ylabel("normalised amplitude")
    ax.legend(fontsize=7)
    fig.savefig(out)
    plt.close(fig)
    return True


def plot_speedup(path: Path, out: Path) -> bool:
    if not path.is_file():
        return False
    import numpy as np

    plt = _style()
    d = json.loads(path.read_text())
    views = d.get("views") or d.get("per_view")
    if views is None:
        # flat {name: {psnr_low, psnr_denoised}} layout
        views = {k: v for k, v in d.items() if isinstance(v, dict)
                 and "psnr_low" in v}
    if not views:
        return False
    names = sorted(views)
    low = [views[k]["psnr_low"] for k in names]
    den = [views[k]["psnr_denoised"] for k in names]
    x = np.arange(len(names))
    fig, ax = plt.subplots(figsize=(5.0, 3.2))
    ax.plot(x, low, "o-", label="low-photon input", color="tab:gray")
    ax.plot(x, den, "o-", label="denoised", color="tab:blue")
    ax.set_xlabel("held-out view")
    ax.set_ylabel("PSNR [dB]")
    gain = float(np.mean(np.array(den) - np.array(low)))
    ax.set_title(f"speedup model holdout (mean gain {gain:+.2f} dB)")
    ax.legend(fontsize=7)
    fig.savefig(out)
    plt.close(fig)
    return True


@click.command()
@click.option("--output-dir", type=click.Path(path_type=Path),
              default=REPO / "docs" / "validation" / "figures")
def main(output_dir):
    output_dir.mkdir(parents=True, exist_ok=True)
    jobs = [
        (plot_noise_fit, REPO / "runs/noise_fit/noise_fit.json",
         "noise_fit.png"),
        (plot_mtf, REPO / "runs/mtf/mtf.json", "mtf.png"),
        (plot_acceptance,
         REPO / "docs/validation/catphan_acceptance_r3.json",
         "catphan_acceptance_r3.png"),
        (plot_acceptance,
         REPO / "docs/validation/catphan_acceptance_r5.json",
         "catphan_acceptance_r5.png"),
        (plot_noise_fit, REPO / "runs/noise_fit_r5/noise_fit_r5.json",
         "noise_fit_r5.png"),
        (plot_speedup, REPO / "runs/speedup/speedup_eval.json",
         "speedup_holdout.png"),
        (plot_4d_motion, REPO / "runs/4d_demo/4d_demo.json",
         "4d_motion_recovery.png"),
    ]
    for fn, src, name in jobs:
        ok = fn(src, output_dir / name)
        click.echo(f"{name}: {'written' if ok else 'skipped (no ' + str(src) + ')'}")


if __name__ == "__main__":
    main()
