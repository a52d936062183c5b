"""Tests for the DL subsystem: FlexUNet, speedup net, segmenter, trainers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbctmc_tpu.models.flex_unet import FlexUNet, instance_norm
from cbctmc_tpu.models.losses import dice_loss, gaussian_nll_loss, segmentation_loss
from cbctmc_tpu.models.segmentation import (
    MCSegmenter,
    N_LABELS,
    PatchStitcher,
    default_segmenter_model,
    get_label_index,
    ordered_patch_slicings,
)
from cbctmc_tpu.models.speedup_net import MCSpeedUpNet, sample_projection
from cbctmc_tpu.models.training import SegmentationTrainer, SpeedupTrainer


def test_flex_unet_2d_shapes():
    model = FlexUNet(n_classes=2, n_levels=2, ndim=2, filter_base=8)
    x = jnp.zeros((2, 32, 48, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 32, 48, 2)


def test_flex_unet_3d_explicit_filters():
    model = FlexUNet(
        n_classes=N_LABELS, n_levels=2, ndim=3, n_filters=[8, 8, 8, 8, 8, 8]
    )
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 16, 16, 16, N_LABELS)


def test_instance_norm():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3)) * 5 + 2
    y = instance_norm(x)
    np.testing.assert_allclose(np.asarray(y.mean(axis=(1, 2))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std(axis=(1, 2))), 1.0, atol=1e-3)


def test_speedup_net_semantics():
    model = MCSpeedUpNet(mean_filter_base=4, var_filter_base=4)
    x = jnp.stack(
        [jnp.full((1, 32, 32), 2.0), jnp.full((1, 32, 32), 1.0)], axis=-1
    )
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    mean, var = out[..., 0], out[..., 1]
    from cbctmc_tpu.models.speedup_net import (
        MEAN_RESIDUAL_BOUND,
        VAR_SCALE_BOUND,
    )

    # mean is bounded to low +- residual bound and non-negative
    assert (mean >= 0).all() and (mean <= 2.0 + MEAN_RESIDUAL_BOUND).all()
    # variance is positive and bounded by var_bound*mean + eps
    assert (var > 0).all()
    assert (var <= VAR_SCALE_BOUND * mean + 1e-5).all()

    sample = sample_projection(jax.random.PRNGKey(1), mean, var)
    assert (sample >= 0).all()


def test_patch_slicing_covers_volume():
    shape, patch = (70, 64, 40), (32, 32, 32)
    covered = np.zeros(shape, bool)
    for sl in ordered_patch_slicings(shape, patch, overlap=0.5):
        covered[sl] = True
        for s, p in zip(sl, patch):
            assert s.stop - s.start == p
    assert covered.all()


def test_patch_stitcher_mean():
    stitcher = PatchStitcher((4, 4))
    stitcher.add_patch(np.full((4, 2), 1.0, np.float32), (slice(None), slice(0, 2)))
    stitcher.add_patch(np.full((4, 4), 3.0, np.float32), (slice(None), slice(None)))
    mean = stitcher.calculate_mean()
    np.testing.assert_allclose(mean[:, :2], 2.0)
    np.testing.assert_allclose(mean[:, 2:], 3.0)


def test_patch_stitcher_variance_welford():
    """The stitcher's M2 accumulation (reference PatchStitcher variance,
    segmentation/patching.py:60-156) must equal the direct per-voxel sample
    variance over the contributing patches, for arbitrary overlaps."""
    rng = np.random.default_rng(3)
    shape = (6, 5)
    patches = [
        (rng.normal(size=(4, 3)).astype(np.float32), (slice(0, 4), slice(0, 3))),
        (rng.normal(size=(6, 5)).astype(np.float32), (slice(None), slice(None))),
        (rng.normal(size=(3, 5)).astype(np.float32), (slice(2, 5), slice(None))),
        (rng.normal(size=(6, 2)).astype(np.float32), (slice(None), slice(3, 5))),
    ]
    stitcher = PatchStitcher(shape)
    samples = [[[] for _ in range(shape[1])] for _ in range(shape[0])]
    for patch, slicing in patches:
        stitcher.add_patch(patch, slicing)
        rows = range(*slicing[0].indices(shape[0]))
        cols = range(*slicing[1].indices(shape[1]))
        for pi, i in enumerate(rows):
            for pj, j in enumerate(cols):
                samples[i][j].append(float(patch[pi, pj]))

    mean = stitcher.calculate_mean()
    var = stitcher.calculate_variance()
    for i in range(shape[0]):
        for j in range(shape[1]):
            vals = np.array(samples[i][j])
            assert mean[i, j] == pytest.approx(vals.mean(), abs=1e-5)
            expected_var = vals.var(ddof=1) if len(vals) > 1 else 0.0
            assert var[i, j] == pytest.approx(expected_var, abs=1e-4)


def test_segmenter_end_to_end_tiny():
    model = FlexUNet(
        n_classes=N_LABELS, n_levels=2, ndim=3, n_filters=[4] * 6
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1))
    )["params"]
    seg = MCSegmenter(
        model=model, params=params, patch_shape=(16, 16, 16), patch_overlap=0.5
    )
    image = np.random.default_rng(0).normal(0, 300, (20, 18, 16)).astype(np.float32)
    one_hot, raw = seg.segment(image)
    assert one_hot.shape[0] == N_LABELS
    assert raw.shape == one_hot.shape
    # softmax group is one-hot: sums to 1 over first 8 channels
    np.testing.assert_array_equal(one_hot[:8].sum(axis=0), 1)
    assert get_label_index("lung") == 6

    # images SMALLER than the patch must come back at their own shape
    # (regression: the pad-to-patch was returned uncropped, r4 patient demo)
    small = np.random.default_rng(1).normal(0, 300, (10, 12, 9)).astype(
        np.float32
    )
    one_hot_s, raw_s = seg.segment(small)
    assert one_hot_s.shape == (N_LABELS, 10, 12, 9)
    assert raw_s.shape == one_hot_s.shape


def test_losses():
    probs = jnp.array([[[[1.0, 0.0]]]])
    target = jnp.array([[[[1.0, 0.0]]]])
    assert float(dice_loss(probs, target)) == pytest.approx(0.0, abs=1e-4)

    mean = jnp.zeros((2, 4, 4, 1))
    var = jnp.full((2, 4, 4, 1), 0.5)
    nll0 = gaussian_nll_loss(mean, var, jnp.zeros_like(mean))
    nll1 = gaussian_nll_loss(mean, var, jnp.ones_like(mean))
    assert float(nll1) > float(nll0)


def test_speedup_trainer_two_phases(tmp_path):
    model = MCSpeedUpNet(mean_filter_base=2, var_filter_base=2)
    trainer = SpeedupTrainer(model, n_pretrain_steps=3, learning_rate=1e-3)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            low = rng.random((2, 16, 16)).astype(np.float32)
            yield {
                "input": jnp.stack([low, low], axis=-1),
                "target": jnp.asarray(low[..., None] * 1.1),
            }

    state = trainer.init(jax.random.PRNGKey(0), next(batches()))
    losses = []
    state = trainer.fit(
        state, batches(), n_steps=6, callback=lambda s, l: losses.append(l)
    )
    assert state.step == 6
    assert len(losses) == 6
    assert np.isfinite(losses).all()


def test_speedup_trainer_separated_architecture(tmp_path):
    """The experimental two-RDN variant (reference speedup/models.py:267)
    must train through the production two-phase L1->NLL schedule - the
    path scripts/train_speedup.py --architecture separated exercises."""
    from cbctmc_tpu.models.experimental import MCSpeedUpNetSeparated

    model = MCSpeedUpNetSeparated()
    trainer = SpeedupTrainer(model, n_pretrain_steps=2, learning_rate=1e-3)
    rng = np.random.default_rng(1)

    def batches():
        while True:
            low = rng.random((2, 16, 16)).astype(np.float32)
            yield {
                "input": jnp.stack([low, low], axis=-1),
                "target": jnp.asarray(low[..., None] * 1.1),
            }

    state = trainer.init(jax.random.PRNGKey(0), next(batches()))
    losses = []
    state = trainer.fit(
        state, batches(), n_steps=4, callback=lambda s, l: losses.append(l)
    )
    assert state.step == 4
    assert np.isfinite(losses).all()


def test_segmentation_trainer_step():
    model = FlexUNet(n_classes=N_LABELS, n_levels=1, ndim=3, n_filters=[2, 2, 2, 2])
    trainer = SegmentationTrainer(model, learning_rate=1e-3)
    rng = np.random.default_rng(1)
    target = np.zeros((1, 8, 8, 8, N_LABELS), np.float32)
    target[..., 0] = 1.0
    batch = {
        "input": jnp.asarray(rng.random((1, 8, 8, 8, 1)), jnp.float32),
        "target": jnp.asarray(target),
    }
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state = trainer.fit(state, iter([batch, batch]), n_steps=2)
    assert state.step == 2


def test_speedup_full_loop_on_simulated_data(tmp_path):
    """The complete speedup workflow on real (tiny) simulation outputs:
    simulate low/high-photon scans, build the triplet dataset, train briefly,
    run batched inference + Gaussian sampling."""
    from cbctmc_tpu.engine.simulate import MCScanner, SimulationParameters
    from cbctmc_tpu.engine.transport import EngineConfig
    from cbctmc_tpu.models.datasets import (
        SpeedupProjectionDataset,
        create_speedup_dataset_from_simulation,
    )
    from cbctmc_tpu.models.speedup_inference import MCSpeedup
    from cbctmc_tpu.physics.materials import default_material_set
    from cbctmc_tpu.geometry.mc_geometry import MCGeometry
    from cbctmc_tpu.pipeline.simulation import MCSimulation

    ts = default_material_set()
    air, water = ts.material("air"), ts.material("h2o")
    shape = (24, 24, 24)
    mats = np.full(shape, air.number, np.uint8)
    dens = np.full(shape, air.density, np.float32)
    mats[8:16, 8:16, 8:16] = water.number
    dens[8:16, 8:16, 8:16] = water.density
    geometry = MCGeometry(mats, dens, image_spacing=(8.0, 8.0, 8.0))

    def simulate(n_hist, folder):
        params = SimulationParameters(
            n_histories=n_hist, n_projections=2, angle_between_projections=180.0,
            n_detector_pixels=(32, 32), detector_size=(400.0, 400.0),
            source_polar_aperture=(-1.0, -1.0), source_azimuthal_aperture=-1.0,
        )
        sim = MCSimulation(
            geometry=geometry, parameters=params,
            engine_config=EngineConfig(n_lanes=1 << 12, max_virtual_trips=4),
            n_pixels_half_fan_x=32, air_n_histories=50_000,
        )
        sim.run_simulation(folder, run_air_simulation=False)
        return folder

    low_dir = simulate(20_000, tmp_path / "low")
    high_dir = simulate(200_000, tmp_path / "high")
    data_dir = tmp_path / "triplets"
    create_speedup_dataset_from_simulation(low_dir, high_dir, data_dir)
    assert len(list(data_dir.glob("*_low.npy"))) == 2

    from cbctmc_tpu.models.speedup_net import MCSpeedUpNet
    from cbctmc_tpu.models.training import SpeedupTrainer

    model = MCSpeedUpNet(mean_filter_base=2, var_filter_base=2)
    trainer = SpeedupTrainer(model, n_pretrain_steps=4, learning_rate=1e-3)
    ds = SpeedupProjectionDataset(data_dir, batch_size=2, patch_shape=(32, 32))
    batches = iter(ds)
    state = trainer.init(jax.random.PRNGKey(0), next(batches))
    losses = []
    state = trainer.fit(state, batches, n_steps=8,
                        callback=lambda s, l: losses.append(l))
    assert np.isfinite(losses).all()

    from cbctmc_tpu.models.checkpoints import load_params, save_params

    ckpt = save_params(state.params, tmp_path / "speedup.ckpt")
    speedup = MCSpeedup(model=model, params=load_params(state.params, ckpt))
    low = np.stack([np.load(p) for p in sorted(data_dir.glob("*_low.npy"))])
    mean, variance, sample = speedup.execute(low)
    assert mean.shape == low.shape and (variance >= 0).all()
    assert np.isfinite(sample).all() and (sample >= 0).all()


def test_experimental_models():
    from cbctmc_tpu.models.experimental import (
        DenseNet2D,
        MCSpeedUpNetSeparated,
        ResidualDenseNet2D,
    )

    x = jnp.ones((1, 16, 16, 2))
    for model, out_ch in (
        (ResidualDenseNet2D(n_blocks=2, features=4, growth_rate=4), 1),
        (DenseNet2D(n_layers=2, growth_rate=4), 1),
        (MCSpeedUpNetSeparated(), 2),
    ):
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert out.shape == (1, 16, 16, out_ch)
        assert np.isfinite(np.asarray(out)).all()
    # separated net: variance strictly positive
    model = MCSpeedUpNetSeparated()
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = model.apply({"params": params}, x)
    assert (np.asarray(out[..., 1]) > 0).all()


def test_synthetic_ct_generator_trains_segmenter(tmp_path):
    """The synthetic-anatomy generator (scripts/generate_synthetic_ct.py)
    produces valid one-hot training cases that drive the production
    segmenter trainer (the round-2 weight-regeneration path)."""
    import sys
    from pathlib import Path as P

    sys.path.insert(0, str(P(__file__).parent.parent / "scripts"))
    from generate_synthetic_ct import generate_case

    import jax

    from cbctmc_tpu.models.datasets import SegmentationPatchDataset
    from cbctmc_tpu.models.segmentation import default_segmenter_model
    from cbctmc_tpu.models.training import SegmentationTrainer

    image, labels = generate_case(seed=5, shape=(48, 40, 32))
    assert labels.shape[0] == 9
    np.testing.assert_allclose(labels[:8].sum(axis=0), 1.0)  # softmax part
    assert labels[6].sum() > 0  # lungs present
    assert labels[8].sum() > 0  # vessels present

    trainer = SegmentationTrainer(default_segmenter_model(), learning_rate=1e-3)
    dataset = SegmentationPatchDataset(
        images=[image], labels=[labels], patch_shape=(32, 32, 32), batch_size=1
    )
    batches = iter(dataset)
    state = trainer.init(jax.random.PRNGKey(0), next(batches))
    losses = []
    for _ in range(3):
        state.params, state.opt_state, loss = trainer._train_step(
            state.params, state.opt_state, next(batches), 0
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
