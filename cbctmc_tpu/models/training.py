"""Training loops for the segmentation and speedup models.

Replaces the reference's external ``ipmi.deeplearning.BaseTrainer``
dependency (cbctmc/segmentation/trainer.py, cbctmc/speedup/trainer.py) with
compact optax loops. Data parallelism: batches are sharded over the mesh's
"photons"/data axis with ``jax.device_put`` + NamedSharding; gradients are
averaged by jit-inserted collectives.

The speedup schedule follows the reference's production recipe
(speedup/trainer.py:329-447): L1 pre-training of the mean head for
``n_pretrain_steps``, then Gaussian negative log likelihood training the
variance head (mean receives no NLL gradient during pre-training phase
switchover).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from pathlib import Path
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import optax

from cbctmc_tpu.models.checkpoints import save_params
from cbctmc_tpu.models.losses import gaussian_nll_loss, l1_loss, segmentation_loss

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: int = 0


class BaseTrainer:
    def __init__(
        self,
        model,
        learning_rate: float = 1e-4,
        output_dir: Optional[Path] = None,
        checkpoint_every: int = 1000,
        log_every: int = 100,
        grad_clip: float = 1.0,
        total_steps: Optional[int] = None,
    ):
        """``grad_clip`` bounds the global gradient norm and
        ``total_steps`` enables a linear-warmup + cosine-decay schedule -
        both stabilisers added after the round-2 speedup run diverged
        mid-L1-phase (holdout PSNR +7.8 dB at step 400 collapsed to -15 dB
        by step 800 under constant-LR unclipped Adam)."""
        self.model = model
        if total_steps:
            schedule = optax.warmup_cosine_decay_schedule(
                init_value=learning_rate * 0.1,
                peak_value=learning_rate,
                warmup_steps=max(1, total_steps // 20),
                decay_steps=total_steps,
                end_value=learning_rate * 0.02,
            )
        else:
            schedule = learning_rate
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip), optax.adam(schedule)
        )
        self.output_dir = Path(output_dir) if output_dir else None
        self.checkpoint_every = checkpoint_every
        self.log_every = log_every

    def init(self, key: jax.Array, example_batch) -> TrainState:
        params = self.model.init(key, example_batch["input"])["params"]
        return TrainState(params=params, opt_state=self.optimizer.init(params))

    def loss_fn(self, params, batch, step):
        raise NotImplementedError

    @partial(jax.jit, static_argnums=(0,))
    def _train_step(self, params, opt_state, batch, step):
        loss, grads = jax.value_and_grad(
            lambda p: self.loss_fn(p, batch, step)
        )(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def fit(
        self,
        state: TrainState,
        batches: Iterator[dict],
        n_steps: int,
        callback: Optional[Callable[[int, float], None]] = None,
    ) -> TrainState:
        for batch in batches:
            if state.step >= n_steps:
                break
            state.params, state.opt_state, loss = self._train_step(
                state.params, state.opt_state, batch, jnp.int32(state.step)
            )
            state.step += 1
            if state.step % self.log_every == 0:
                logger.info("step %d: loss=%.5f", state.step, float(loss))
            if callback:
                callback(state.step, float(loss))
            if self.output_dir and state.step % self.checkpoint_every == 0:
                save_params(
                    state.params, self.output_dir / f"step_{state.step}.ckpt"
                )
        if self.output_dir:
            save_params(state.params, self.output_dir / "final.ckpt")
        return state


class SegmentationTrainer(BaseTrainer):
    """Dice training of the 9-label CT segmenter; batch dict keys:
    input [B, x, y, z, 1], target [B, x, y, z, 9] (one hot + vessels)."""

    def loss_fn(self, params, batch, step):
        logits = self.model.apply({"params": params}, batch["input"])
        return segmentation_loss(logits, batch["target"])


class SpeedupTrainer(BaseTrainer):
    """Two-phase speedup training; batch dict keys:
    input [B, H, W, 2] (low photon, forward projection),
    target [B, H, W, 1] (high-photon projection)."""

    def __init__(self, model, n_pretrain_steps: int = 5000, **kwargs):
        super().__init__(model, **kwargs)
        self.n_pretrain_steps = n_pretrain_steps

    def loss_fn(self, params, batch, step):
        out = self.model.apply({"params": params}, batch["input"])
        mean, variance = out[..., 0:1], out[..., 1:2]
        pretrain = l1_loss(mean, batch["target"])
        nll = gaussian_nll_loss(mean, variance, batch["target"])
        return jnp.where(step < self.n_pretrain_steps, pretrain, nll)


def shard_batch(batch: dict, mesh, axis_name: str = "photons") -> dict:
    """Place a host batch onto the mesh, sharded over the batch axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
