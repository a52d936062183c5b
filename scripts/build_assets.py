"""Build the bundled physics data assets (packed .npz) from PENELOPE-2006
material interchange files (.mcgpu) and .spc spectra.

The interchange formats are public (MC-GPU v1.3 / PENELOPE 2006); by default
this script reads the data files shipped with the reference pipeline. The
packed assets contain only physical cross-section data (no code).

Usage:
    python scripts/build_assets.py [--source-dir DIR] [--out-dir DIR]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from cbctmc_tpu.physics.materials import MaterialTableSet
from cbctmc_tpu.physics.spectrum import Spectrum


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--source-dir",
        type=Path,
        default=Path("/root/reference/cbctmc/assets"),
        help="Directory containing material_files/ and spectra/",
    )
    parser.add_argument(
        "--out-dir",
        type=Path,
        default=Path(__file__).parent.parent / "cbctmc_tpu" / "assets",
    )
    args = parser.parse_args()

    args.out_dir.mkdir(parents=True, exist_ok=True)

    material_dir = args.source_dir / "material_files"
    table_set = MaterialTableSet.from_directory(material_dir, "*__5_125kev.mcgpu")
    out = args.out_dir / "materials_125kev.npz"
    table_set.save_npz(out)
    print(f"Wrote {out} ({out.stat().st_size/1e6:.1f} MB): "
          f"{table_set.n_materials} materials, {table_set.n_bins} energy bins")
    print("Material numbers (sorted by density):")
    for identifier, mat in table_set.registry.items():
        print(f"  {mat.number:2d}  {identifier:20s} rho={mat.density:.5f}")

    spectra_dir = args.source_dir / "spectra"
    for spc in sorted(spectra_dir.glob("*.spc")):
        spectrum = Spectrum.from_spc_file(spc)
        out = args.out_dir / f"spectrum_{spectrum.name}.npz"
        spectrum.save_npz(out)
        print(
            f"Wrote {out}: {spectrum.n_bins} bins, "
            f"mean energy {spectrum.mean_energy/1e3:.3f} keV"
        )

    build_bowtie_asset(args.source_dir, args.out_dir)


def build_bowtie_asset(source_dir: Path, out_dir: Path):
    """Extract the bowtie-filter physical data tables from the reference's
    spectrum module (cbctmc/mc/spectrum.py:9-1339): the per-fan-position
    aluminium thickness profiles (BOWTIE_FILTERS, mm), the Ti/Al linear
    attenuation curves (FILTERS, 1/mm at a 1 keV grid) and the unfiltered
    Varian-normalised tube spectra (VARIAN_NORM_SPECTRA, flux per 1 keV
    bin). These are measured/physical data literals, not code; only the
    data block of the module is evaluated."""
    import numpy as np

    src = source_dir.parent / "mc" / "spectrum.py"
    text = src.read_text()
    # the data block ends right before the attenuation helper section
    end = text.index("@dataclass")
    start = text.index("BOWTIE_FILTERS")
    ns = {"np": np}
    exec(text[start:end], ns)  # noqa: S102 - pure array literals

    out = out_dir / "bowtie_filters.npz"
    arrays = {}
    for name, profile in ns["BOWTIE_FILTERS"].items():
        arrays[f"bowtie_{name}_mm"] = np.asarray(profile, np.float64)
    for name, mus in ns["FILTERS"].items():
        arrays[f"mu_{name}_per_mm"] = np.asarray(mus, np.float64)
    for kvp, flux in ns["VARIAN_NORM_SPECTRA"].items():
        arrays[f"varian_norm_{kvp}kvp"] = np.asarray(flux, np.float64)
    np.savez_compressed(out, **arrays)
    print(f"Wrote {out}: {sorted(arrays)}")


if __name__ == "__main__":
    main()
