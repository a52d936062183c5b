"""Train the projection-denoising speedup model
(reference workflow: scripts/train_speedup.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import click
from pathlib import Path


@click.command()
@click.option("--data-folder", type=click.Path(path_type=Path), required=True)
@click.option("--output-dir", type=click.Path(path_type=Path), required=True)
@click.option("--n-steps", type=int, default=100_000)
@click.option("--n-pretrain-steps", type=int, default=5000)
@click.option("--batch-size", type=int, default=8)
@click.option("--learning-rate", type=float, default=1e-4)
@click.option("--seed", type=int, default=0)
@click.option("--architecture",
              type=click.Choice(["unet", "separated"]), default="unet",
              help="unet = production MCSpeedUpNet (reference "
                   "speedup/models.py:393-473); separated = the reference's "
                   "two-RDN experimental variant (:267) for research parity")
def main(data_folder, output_dir, n_steps, n_pretrain_steps, batch_size,
         learning_rate, seed, architecture):
    import jax

    from cbctmc_tpu.models.datasets import SpeedupProjectionDataset
    from cbctmc_tpu.models.speedup_net import MCSpeedUpNet
    from cbctmc_tpu.models.training import SpeedupTrainer

    if architecture == "separated":
        from cbctmc_tpu.models.experimental import MCSpeedUpNetSeparated

        model = MCSpeedUpNetSeparated()
    else:
        model = MCSpeedUpNet()
    trainer = SpeedupTrainer(
        model, n_pretrain_steps=n_pretrain_steps, learning_rate=learning_rate,
        output_dir=output_dir,
    )
    dataset = SpeedupProjectionDataset(data_folder, batch_size=batch_size, seed=seed)
    batches = iter(dataset)
    state = trainer.init(jax.random.PRNGKey(seed), next(batches))
    trainer.fit(state, batches, n_steps=n_steps)


if __name__ == "__main__":
    main()
