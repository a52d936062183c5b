"""Fit water-precorrection coefficients on a simulated CatPhan604 scan
(reference workflow: scripts/fit_wpc.py / fit_wpc_catphan.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click
from pathlib import Path


@click.command()
@click.option("--projections-filepath", type=click.Path(path_type=Path),
              required=True, help="normalized projection stack (.mha)")
@click.option("--output-folder", type=click.Path(path_type=Path), required=True)
@click.option("--n-projections", type=int, default=894)
@click.option("--n-orders", type=int, default=6)
def main(projections_filepath, output_folder, n_projections, n_orders):
    import json

    from cbctmc_tpu.pipeline.reconstruction import (
        default_cone_beam_geometry,
        load_projection_stack_for_recon,
    )
    from cbctmc_tpu.pipeline.wpc_fit import run_wpc_fit
    from cbctmc_tpu.recon.geometry import VolumeGrid, mc_scan_angles

    stack, meta = load_projection_stack_for_recon(projections_filepath)
    geometry = default_cone_beam_geometry(meta)
    report = run_wpc_fit(
        stack, geometry, mc_scan_angles(n_projections),
        VolumeGrid(shape=(256, 256, 60)), n_orders=n_orders,
        output_folder=output_folder,
    )
    click.echo(json.dumps(report["coefficients"]))


if __name__ == "__main__":
    main()
