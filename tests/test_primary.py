"""Deterministic-primary validation: the analytic expectation of the MC
primary channel (engine/primary.py) against closed-form attenuation and
against the transport engine itself."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
from cbctmc_tpu.engine.primary import (
    SpectrumQuadrature,
    _detector_ray_dirs,
    _trace_chunk,
    deterministic_primary,
    photon_fractions,
    sample_primary,
)
from cbctmc_tpu.engine.transport import (
    EngineConfig,
    make_voxel_volume,
)
from cbctmc_tpu.physics.materials import default_material_set
from cbctmc_tpu.physics.spectrum import Spectrum, default_spectrum

from tests.test_transport import N_PIX, _make_run, _scene, mono60, table_set  # noqa: F401


def _geom(theta=-1.0, phi=(-1.0, -1.0)):
    return ScanGeometry(
        n_pixels_x=N_PIX, n_pixels_z=N_PIX,
        detector_size_x=20.0, detector_size_z=20.0,
        sdd=60.0, sad=40.0,
        aperture_phi1=phi[0], aperture_phi2=phi[1], aperture_theta=theta,
        source_position_0=(10.0, 10.0 - 40.0, 10.0),
    )


def test_photon_fractions_normalised_and_fan_limited():
    g = _geom()
    f = photon_fractions(g)
    assert f.shape == (N_PIX, N_PIX)
    assert f.sum() == pytest.approx(1.0, abs=1e-9)
    # fit-to-detector aperture: every pixel lit, centre pixel gets more
    # photons than a corner pixel (1/r^3 falloff)
    assert (f > 0).all()
    # 1/r^3 falloff: (r_corner/r_centre)^3 = (3800/3600)^1.5 ~ 1.084 here
    assert f[N_PIX // 2, N_PIX // 2] > 1.05 * f[0, 0]

    # asymmetric fan narrower than the detector: outside columns are dark
    g2 = _geom(phi=(2.0, 8.0))
    f2 = photon_fractions(g2)
    assert f2.sum() == pytest.approx(1.0, abs=1e-9)
    u_centres = (np.arange(N_PIX) + 0.5) * g2.pixel_size_x - 10.0
    dark = (u_centres > 60.0 * np.tan(np.radians(2.0)) + g2.pixel_size_x) | (
        u_centres < -60.0 * np.tan(np.radians(8.0)) - g2.pixel_size_x
    )
    assert (f2[:, dark] == 0).all()
    assert (f2[:, ~dark].sum(axis=0) > 0).all()


def test_tracer_exact_path_lengths(table_set):
    """Amanatides-Woo path lengths through a uniform water cube equal the
    analytic chord lengths."""
    water = table_set.material("h2o")
    shape = (40, 40, 40)
    mats = np.full(shape, water.number, np.uint8)
    dens = np.full(shape, water.density, np.float32)
    volume = make_voxel_volume(mats.astype(np.int32) - 1, dens, (0.5,) * 3)

    g = _geom()
    source, detector = build_scan(g, [270.0])
    src = np.asarray(source.position[0])
    dirs = _detector_ray_dirs(g, src, detector, 0)
    inv_rho = np.array([1.0 / m.density for m in table_set.materials],
                       np.float32)
    L = np.asarray(_trace_chunk(
        volume.packed, volume.shape, volume.voxel_size, volume.den_scale,
        jnp.asarray(inv_rho), jnp.asarray(src), jnp.asarray(dirs),
        n_materials=table_set.n_materials, max_iters=300,
    ))

    # analytic chord through the [0,20]^3 cube
    t0 = np.full(len(dirs), -np.inf)
    t1 = np.full(len(dirs), np.inf)
    for ax in range(3):
        d = np.where(np.abs(dirs[:, ax]) < 1e-9, 1e-9, dirs[:, ax])
        ta = (0.0 - src[ax]) / d
        tb = (20.0 - src[ax]) / d
        t0 = np.maximum(t0, np.minimum(ta, tb))
        t1 = np.minimum(t1, np.maximum(ta, tb))
    chord = np.maximum(t1 - np.maximum(t0, 0.0), 0.0)

    w_idx = water.number - 1
    np.testing.assert_allclose(L[:, w_idx], chord, rtol=2e-3, atol=2e-3)
    others = np.delete(np.arange(table_set.n_materials), w_idx)
    assert np.abs(L[:, others]).max() < 1e-5


@pytest.mark.slow
def test_primary_matches_mc(table_set, mono60):
    """Deterministic primary == MC primary channel within MC error on the
    air + water-slab scene (the same acceptance the oracle uses)."""
    mats, dens = _scene(table_set, with_water_slab=True)
    run = _make_run(table_set, mono60, mats, dens,
                    config=EngineConfig(n_lanes=1 << 14, max_virtual_trips=8))
    n = 1_500_000
    # run_projection returns the RAW tally (eV/pixel); normalise to the
    # engine's eV/cm^2/hist convention (MCScanner.simulate does the same)
    a_pix = (20.0 / N_PIX) ** 2
    img = np.asarray(run(n, 11), np.float64) / (a_pix * n)
    mc_primary = img[0]

    g = _geom()
    source, detector = build_scan(g, [270.0])
    volume = make_voxel_volume(
        mats.astype(np.int32) - 1, dens, (0.5,) * 3
    )
    mean, var = deterministic_primary(
        volume, table_set, mono60, g, source, detector, n_sub=2,
    )

    # total detected energy agrees to MC precision
    rel_tot = mc_primary.sum() / mean.sum() - 1.0
    assert abs(rel_tot) < 0.01

    # 8x8 superpixel means agree within ~4 sigma of the predicted noise
    k = N_PIX // 8
    mc_sp = mc_primary.reshape(8, k, 8, k).mean(axis=(1, 3))
    de_sp = mean.reshape(8, k, 8, k).mean(axis=(1, 3))
    sig_sp = np.sqrt(var.reshape(8, k, 8, k).sum(axis=(1, 3)) / n) / k / k
    z = (mc_sp - de_sp) / np.maximum(sig_sp, 1e-12)
    assert np.abs(z).max() < 5.0
    assert np.abs(z).mean() < 1.5


@pytest.mark.slow
def test_primary_noise_model(table_set, mono60):
    """Empirical MC primary variance matches the compound-Poisson model."""
    mats, dens = _scene(table_set, with_water_slab=True)
    run = _make_run(table_set, mono60, mats, dens,
                    config=EngineConfig(n_lanes=1 << 13, max_virtual_trips=8))
    n, reps = 150_000, 10
    a_pix = (20.0 / N_PIX) ** 2
    imgs = np.stack([
        np.asarray(run(n, 100 + r), np.float64)[0] / (a_pix * n)
        for r in range(reps)
    ])

    g = _geom()
    source, detector = build_scan(g, [270.0])
    volume = make_voxel_volume(mats.astype(np.int32) - 1, dens, (0.5,) * 3)
    mean, var = deterministic_primary(
        volume, table_set, mono60, g, source, detector, n_sub=2,
    )

    # pool pixel-variances over the detector: the ratio of summed empirical
    # to summed predicted variance is chi^2-concentrated around 1
    emp = imgs.var(axis=0, ddof=1)
    ratio = emp.sum() / (var / n).sum()
    assert 0.75 < ratio < 1.30

    # and the Gaussian sampler reproduces the same statistics
    keys = jax.random.split(jax.random.PRNGKey(0), reps)
    samples = np.stack([
        sample_primary(k, mean, var, n) for k in keys
    ])
    ratio_s = samples.var(axis=0, ddof=1).sum() / (var / n).sum()
    assert 0.75 < ratio_s < 1.30


def test_quadrature_matches_spectrum(table_set):
    q = SpectrumQuadrature.build(table_set, default_spectrum(), n_sub=2)
    assert q.weights.sum() == pytest.approx(1.0, rel=1e-5)
    # mean quadrature energy equals the spectrum's own mean
    spec = default_spectrum()
    e = np.asarray(spec.energies, np.float64)
    p = np.asarray(spec.probabilities, np.float64)
    p = p / p.sum()
    mean_e = (p * 0.5 * (e[:-1] + e[1:])).sum()
    assert float((q.weights * q.energies_ev).sum()) == pytest.approx(
        mean_e, rel=1e-4
    )


def test_fast_scan_composition():
    """compose_fast_view preserves means and injects the modelled noise."""
    from cbctmc_tpu.pipeline.fast_scan import FastScanConfig, compose_fast_view

    rng = np.random.default_rng(0)
    shape = (24, 24)
    p_mean = np.full(shape, 40.0, np.float32)
    p_var = np.full(shape, 40.0 * 60_000.0 * 0.39, np.float32)  # ~lambda E^2
    scatter_true = np.full(shape, 5.0, np.float32)
    mc_primary = p_mean + rng.normal(0, 0.5, shape).astype(np.float32)
    mc_total = mc_primary + scatter_true + rng.normal(0, 0.8, shape).astype(
        np.float32
    )

    cfg = FastScanConfig(
        n_histories_target=1e12, pixel_area_cm2=0.39,
        scatter_smooth_sigma_px=4.0,
    )
    keys = jax.random.split(jax.random.PRNGKey(1), 16)
    prim, tot = compose_fast_view(
        keys[0], p_mean, p_var, mc_primary, mc_total, cfg
    )
    # at 1e12 histories the injected noise is negligible: the total is the
    # deterministic primary + the (smoothed) MC scatter
    assert abs(prim.mean() - 40.0) < 0.05
    assert abs(tot.mean() - 45.0) < 0.5

    # at low n the empirical std across seeds matches the model
    cfg_lo = FastScanConfig(
        n_histories_target=1e6, pixel_area_cm2=0.39,
        scatter_smooth_sigma_px=4.0,
    )
    prims = np.stack([
        compose_fast_view(k, p_mean, p_var, mc_primary, mc_total, cfg_lo)[0]
        for k in keys
    ])
    model_std = np.sqrt(p_var[0, 0] / 1e6)
    emp_std = prims.std(axis=0, ddof=1).mean()
    assert emp_std == pytest.approx(model_std, rel=0.25)


def test_uniform_clearance_volume_levels_and_equality(table_set):
    """The PRIMARY-ONLY uniform-clearance repack (a) marks only voxels
    whose |.|_inf <= 2^k box is word-uniform, and (b) leaves the traced
    path lengths unchanged (spans accumulate the same seg * rho)."""
    from cbctmc_tpu.engine.primary import uniform_clearance_volume
    from cbctmc_tpu.engine.transport import _AIR_SHIFT as AIR_SHIFT

    water = table_set.material("h2o")
    acrylic = table_set.material("acrylic")
    shape = (48, 48, 48)
    mats = np.full(shape, water.number, np.uint8)
    dens = np.full(shape, water.density, np.float32)
    # an insert breaking uniformity + an air pocket
    mats[30:38, 8:20, 10:22] = acrylic.number
    dens[30:38, 8:20, 10:22] = acrylic.density
    mats[4:10, 36:44, 30:40] = 1
    dens[4:10, 36:44, 30:40] = 0.0012
    volume = make_voxel_volume(mats.astype(np.int32) - 1, dens, (0.5,) * 3)
    uni = uniform_clearance_volume(volume)

    n_vox = int(np.prod(shape))
    flat = np.asarray(uni.packed)[:n_vox]
    k = (flat >> AIR_SHIFT) & 0x7
    base = np.asarray(volume.packed)[:n_vox] & ~np.uint32(0x3F << 21)
    w = base.reshape(shape[2], shape[1], shape[0])
    kz = k.reshape(shape[2], shape[1], shape[0])
    assert (kz > 0).mean() > 0.5  # the bulk gets real clearance
    rng = np.random.default_rng(0)
    for _ in range(200):
        z, y, x = (int(rng.integers(0, s)) for s in shape[::-1])
        lvl = int(kz[z, y, x])
        if lvl == 0:
            continue
        r = 1 << lvl
        box = w[max(z - r, 0):z + r + 1, max(y - r, 0):y + r + 1,
                max(x - r, 0):x + r + 1]
        assert (box == w[z, y, x]).all(), (z, y, x, lvl)

    g = _geom()
    source, detector = build_scan(g, [270.0])
    src = np.asarray(source.position[0])
    dirs = _detector_ray_dirs(g, src, detector, 0)
    inv_rho = np.array([1.0 / m.density for m in table_set.materials],
                       np.float32)

    def trace(vol):
        return np.asarray(_trace_chunk(
            vol.packed, vol.shape, vol.voxel_size, vol.den_scale,
            jnp.asarray(inv_rho), jnp.asarray(src), jnp.asarray(dirs),
            n_materials=table_set.n_materials, max_iters=400,
        ))

    L_ref, L_uni = trace(volume), trace(uni)
    np.testing.assert_allclose(L_uni, L_ref, rtol=2e-4, atol=5e-4)
