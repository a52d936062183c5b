"""End-to-end physics tests of the transport engine on small scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
from cbctmc_tpu.engine.tables import build_device_tables, build_woodcock_table
from cbctmc_tpu.engine.transport import EngineConfig, make_voxel_volume, run_projection
from cbctmc_tpu.physics.materials import default_material_set
from cbctmc_tpu.physics.spectrum import Spectrum

N_PIX = 32
CONFIG = EngineConfig(n_lanes=1 << 14, max_virtual_trips=8)


@pytest.fixture(scope="module")
def table_set():
    return default_material_set()


@pytest.fixture(scope="module")
def mono60(table_set):
    """(Nearly) monoenergetic 60 keV spectrum."""
    return Spectrum(
        name="mono60",
        energies=np.array([59_995.0, 60_005.0], np.float32),
        probabilities=np.array([1.0], np.float32),
    )


def _scene(table_set, with_water_slab: bool):
    """20 cm air cube, optionally with a 5 cm water slab across the beam."""
    shape = (40, 40, 40)  # 5 mm voxels -> 20 cm cube
    air = table_set.material("air")
    water = table_set.material("h2o")
    mats = np.full(shape, air.number, np.uint8)
    dens = np.full(shape, air.density, np.float32)
    if with_water_slab:
        mats[:, 15:25, :] = water.number  # y in [7.5, 12.5) cm
        dens[:, 15:25, :] = water.density
    return mats, dens


def _make_run(table_set, spectrum, mats, dens, theta=-1.0, phi=(-1.0, -1.0),
              config=CONFIG):
    """Build the scene once and return a run(n, seed, ...) closure over
    run_projection (kwargs pass through, e.g. carry_in/return_carry)."""
    tables = build_device_tables(table_set, spectrum)
    max_density = np.zeros(table_set.n_materials, np.float32)
    np.maximum.at(max_density, mats.astype(int).reshape(-1) - 1, dens.reshape(-1))
    woodcock = build_woodcock_table(table_set, max_density)
    volume = make_voxel_volume(mats.astype(np.int32) - 1, dens, (0.5, 0.5, 0.5))

    geom = ScanGeometry(
        n_pixels_x=N_PIX, n_pixels_z=N_PIX,
        detector_size_x=20.0, detector_size_z=20.0,
        sdd=60.0, sad=40.0,
        aperture_phi1=phi[0], aperture_phi2=phi[1], aperture_theta=theta,
        source_position_0=(10.0, 10.0 - 40.0, 10.0),
    )
    source, detector = build_scan(geom, [270.0])
    src = jax.tree.map(lambda x: jnp.asarray(x[0]), source)
    det = jax.tree.map(lambda x: jnp.asarray(x[0]), detector)

    def run(n_histories, seed, **kwargs):
        return run_projection(
            tables, woodcock, volume, src, det,
            jnp.int32(n_histories), jax.random.PRNGKey(seed),
            n_pixels_x=N_PIX, n_pixels_z=N_PIX, config=config, **kwargs,
        )

    return run


def _simulate(table_set, spectrum, mats, dens, n_histories=300_000, theta=-1.0,
              phi=(-1.0, -1.0), seed=0, config=CONFIG):
    run = _make_run(table_set, spectrum, mats, dens, theta=theta, phi=phi,
                    config=config)
    return np.asarray(run(n_histories, seed), np.float64)


def test_beer_lambert_slab_transmission(table_set, mono60):
    """Primary-channel transmission through 5 cm of water must follow
    exp(-mu * t) with mu from the loaded total-attenuation tables."""
    air_mats, air_dens = _scene(table_set, with_water_slab=False)
    slab_mats, slab_dens = _scene(table_set, with_water_slab=True)

    img_air = _simulate(
        table_set, mono60, air_mats, air_dens, n_histories=800_000, seed=1
    )
    img_slab = _simulate(
        table_set, mono60, slab_mats, slab_dens, n_histories=800_000, seed=2
    )

    c = N_PIX // 2
    sl = slice(c - 2, c + 2)
    primary_air = img_air[0, sl, sl].sum()
    primary_slab = img_slab[0, sl, sl].sum()
    assert primary_air > 0

    water = table_set.materials[table_set.index_of("h2o")]
    air = table_set.materials[table_set.index_of("air")]
    b = int((60_000.0 - table_set.e0) / table_set.de)
    mu_w = 1.0 / water.mfp_total[b]
    mu_air = (1.0 / air.mfp_total[b]) * (air.density / 1.0)  # nominal rho
    expected = np.exp(-(mu_w - mu_air) * 5.0)

    ratio = primary_slab / primary_air
    assert ratio == pytest.approx(expected, rel=0.08)

    # scatter reaches the detector only in the slab run
    assert img_slab[1].sum() > 0  # Compton
    assert img_slab[2].sum() > 0  # Rayleigh
    assert img_air[1:].sum() < 0.05 * img_air[0].sum()


def test_air_flat_field(table_set, mono60):
    """With the fan fitted to the detector, the air scan must light up every
    pixel and deposit most of the emitted energy (air transmission over
    ~30-50 cm is > 95% at 60 keV)."""
    mats, dens = _scene(table_set, with_water_slab=False)
    img = _simulate(table_set, mono60, mats, dens, n_histories=400_000, seed=3)

    total = img.sum()
    emitted = 400_000 * 60_000.0
    assert total / emitted > 0.90
    assert (img.sum(axis=0) > 0).all()

    # left-right symmetry of the flat field (statistical)
    profile = img[0].sum(axis=0)
    asym = abs(profile[: N_PIX // 2].sum() - profile[N_PIX // 2 :].sum()) / profile.sum()
    assert asym < 0.02


def test_pencil_beam_hits_detector_center(table_set, mono60):
    """A (near) pencil beam along +y must tally into the central pixels."""
    mats, dens = _scene(table_set, with_water_slab=False)
    img = _simulate(
        table_set, mono60, mats, dens,
        n_histories=20_000, theta=0.02, phi=(0.01, 0.01), seed=4,
    )
    total = img.sum()
    c = N_PIX // 2
    center = img[0, c - 1 : c + 1, c - 1 : c + 1].sum()
    assert center / total > 0.98


def test_energy_conservation_bound(table_set, mono60):
    """Detected energy can never exceed emitted energy."""
    mats, dens = _scene(table_set, with_water_slab=True)
    img = _simulate(table_set, mono60, mats, dens, n_histories=100_000, seed=5)
    assert img.sum() <= 100_000 * 60_005.0


def test_dose_tally(table_set, mono60):
    """Voxel/material dose tallies: energy is deposited in the water slab
    and energy accounting closes (emitted = detected + deposited + lost
    below-cutoff residual, within tolerance)."""
    from cbctmc_tpu.engine.ct import ScanGeometry, build_scan
    from cbctmc_tpu.engine.tables import build_device_tables, build_woodcock_table
    from cbctmc_tpu.engine.transport import make_voxel_volume, run_projection
    import jax
    import jax.numpy as jnp

    mats, dens = _scene(table_set, with_water_slab=True)
    tables = build_device_tables(table_set, mono60)
    max_density = np.zeros(table_set.n_materials, np.float32)
    np.maximum.at(max_density, mats.astype(int).reshape(-1) - 1, dens.reshape(-1))
    woodcock = build_woodcock_table(table_set, max_density)
    volume = make_voxel_volume(mats.astype(np.int32) - 1, dens, (0.5, 0.5, 0.5))

    geom = ScanGeometry(
        n_pixels_x=N_PIX, n_pixels_z=N_PIX,
        detector_size_x=20.0, detector_size_z=20.0,
        sdd=60.0, sad=40.0,
        aperture_phi1=-1.0, aperture_phi2=-1.0, aperture_theta=-1.0,
        source_position_0=(10.0, 10.0 - 40.0, 10.0),
    )
    source, detector = build_scan(geom, [270.0])
    src = jax.tree.map(lambda x: jnp.asarray(x[0]), source)
    det = jax.tree.map(lambda x: jnp.asarray(x[0]), detector)

    import dataclasses

    cfg = dataclasses.replace(CONFIG, tally_dose=True)
    n_hist = 100_000
    img, extras = run_projection(
        tables, woodcock, volume, src, det,
        jnp.int32(n_hist), jax.random.PRNGKey(11),
        n_pixels_x=N_PIX, n_pixels_z=N_PIX, config=cfg,
    )
    voxel_dose = np.asarray(extras["voxel_dose"], np.float64)
    material_dose = np.asarray(extras["material_dose"], np.float64)

    assert voxel_dose.sum() > 0
    # voxel dose and material dose agree
    assert voxel_dose.sum() == pytest.approx(material_dose[:, 0].sum(), rel=1e-3)
    # nearly all dose lands in water (material index 5), not air
    water_idx = table_set.index_of("h2o")
    assert material_dose[water_idx, 0] / material_dose[:, 0].sum() > 0.99
    # energy accounting: deposited fraction is physical (0 < f < 1)
    emitted = n_hist * 60_000.0
    deposited = voxel_dose.sum()
    detected_total = float(np.asarray(img, np.float64).sum())
    assert deposited < emitted
    # detector only covers part of the solid angle; bound loosely
    assert deposited + detected_total < emitted * 1.01
    assert material_dose[:, 1].sum() > 0  # squared accumulator filled


def test_majorant_poly_conservative(table_set):
    """The analytic majorant tiers (engine v3.4) must under-estimate the
    tabulated majorant curves everywhere: exp(poly(t)) <= a + E*b on a fine
    energy grid (delta tracking is unbiased only for a conservative
    majorant; tables.fit_log_mfp_poly)."""
    max_density = np.ones(table_set.n_materials, np.float32)
    wt = build_woodcock_table(table_set, max_density)
    e0, de = table_set.e0, table_set.de
    n_bins = np.asarray(wt.a).shape[0]
    e_fine = e0 + (de / 3) * np.arange(3 * (n_bins - 1) + 1)
    bins = np.minimum(((e_fine - e0) / de).astype(int), n_bins - 1)
    lo, hi = float(wt.log_e_lo), float(wt.log_e_hi)
    t = np.clip((np.log(e_fine) - lo) / (hi - lo), 0.0, 1.0)
    def f32_horner(coeffs, t_arr):
        """Emulate the engine's runtime evaluation exactly: f32 Horner on
        f32 t followed by f32 exp (transport.majorants_of). The fixed
        1e-4 log-margin in fit_log_mfp_poly must absorb THIS rounding,
        not the f64 one."""
        c = np.asarray(coeffs, np.float32)
        acc = np.full_like(t_arr, c[0], dtype=np.float32)
        for k in range(1, c.shape[0]):
            acc = (acc * t_arr.astype(np.float32) + c[k]).astype(np.float32)
        return np.exp(acc, dtype=np.float32)

    for pa, pb, poly in (
        (wt.a, wt.b, wt.wc_logpoly),
        (wt.soft_a, wt.soft_b, wt.soft_logpoly),
    ):
        curve = np.asarray(pa)[bins] + e_fine * np.asarray(pb)[bins]
        fit = np.exp(np.polyval(np.asarray(poly, np.float64), t))
        assert (fit <= curve * (1.0 + 1e-6)).all()
        # the guarantee must also hold in the engine's own precision
        assert (f32_horner(poly, t).astype(np.float64) <= curve * (1.0 + 1e-6)).all()
        # and the fit is reasonably tight, so the extra virtual-flight
        # cost of the analytic tier stays small
        assert (fit / curve).min() > 0.85

    # air tier: the engine's true acceptance curve is 1/inv_air(E) with
    # inv_air piecewise-LINEAR (linearize_inverse_mfp), which between knots
    # lies BELOW the chord of the MFP knot values (1/x convexity) - the fit
    # must stay under the true curve, not only the chord
    from cbctmc_tpu.physics.materials import linearize_inverse_mfp

    air = table_set.materials[0]
    a_air, b_air = linearize_inverse_mfp(
        np.asarray(air.mfp_total)[None], np.array([air.density]), e0, de
    )
    inv_air = np.asarray(a_air[0], np.float64)[bins] + e_fine * np.asarray(
        b_air[0], np.float64
    )[bins]
    true_mfp_air = 1.0 / np.maximum(inv_air, 1e-30)
    fit_air = np.exp(np.polyval(np.asarray(wt.air_logpoly, np.float64), t))
    assert (fit_air <= true_mfp_air * (1.0 + 1e-6)).all()
    assert (
        f32_horner(wt.air_logpoly, t).astype(np.float64)
        <= true_mfp_air * (1.0 + 1e-6)
    ).all()
    assert (fit_air / true_mfp_air).min() > 0.85


def test_tally_doubles_overflow_carry(table_set, mono60):
    """A starved rare-doubles tally budget must not lose detector energy:
    overflowed records are carried in the stash and tallied later. The two
    runs consume different RNG sub-streams once a carry blocks a stash, so
    the comparison is statistical."""
    mats, dens = _scene(table_set, with_water_slab=True)
    # the compacted doubles budget is a v3.4 mechanism (v4 always carries
    # doubles in the stash), so both runs pin resolve_inplace=False
    img_default = _simulate(
        table_set, mono60, mats, dens, n_histories=150_000, seed=11,
        config=EngineConfig(
            n_lanes=CONFIG.n_lanes,
            max_virtual_trips=CONFIG.max_virtual_trips,
            resolve_inplace=False,
        ),
    )
    starved = EngineConfig(
        n_lanes=CONFIG.n_lanes,
        max_virtual_trips=CONFIG.max_virtual_trips,
        resolve_inplace=False,
        doubles_fraction=1e-9,  # floor of 32 lanes
    )
    img_starved = _simulate(
        table_set, mono60, mats, dens, n_histories=150_000, seed=11,
        config=starved,
    )
    assert img_starved.sum() <= 150_000 * 60_005.0
    assert img_starved.sum() == pytest.approx(img_default.sum(), rel=0.02)
    for ch in range(2):
        assert img_starved[ch].sum() == pytest.approx(
            img_default[ch].sum(), rel=0.05
        )


def test_tau_table_engine_ab(table_set, mono60):
    """Engine A/B across three stacked fallbacks: the default v4
    resolve-in-place path vs the v3.4 compacted path (resolve_inplace=False)
    vs the fully-analytic v3.4 path (tau_table=False, the GCOa tau
    rejection). All three must agree channel-by-channel within statistics -
    this pins the v4 redesign (gather-free sigma, fused angle ICDF, masked
    resolve, single-tally) to the extensively validated v3 physics. The
    sampler-level chi-square A/B lives in test_sampler_statistics.py."""
    mats, dens = _scene(table_set, with_water_slab=True)
    img_v4 = _simulate(table_set, mono60, mats, dens, n_histories=400_000,
                       seed=7, config=CONFIG)
    img_v3 = _simulate(
        table_set, mono60, mats, dens, n_histories=400_000, seed=9,
        config=EngineConfig(n_lanes=1 << 14, max_virtual_trips=8,
                            resolve_inplace=False),
    )
    img_ana = _simulate(
        table_set, mono60, mats, dens, n_histories=400_000, seed=8,
        config=EngineConfig(n_lanes=1 << 14, max_virtual_trips=8,
                            resolve_inplace=False, tau_table=False),
    )
    for img_b in (img_v3, img_ana):
        assert img_b.sum() == pytest.approx(img_v4.sum(), rel=0.03)
        # per-channel: primary identical physics; compton exercises the
        # sampling paths; rayleigh/multi are small but nonzero
        for ch, rel in ((0, 0.03), (1, 0.08), (2, 0.15)):
            assert img_b[ch].sum() == pytest.approx(img_v4[ch].sum(), rel=rel)


def test_cross_chunk_survivor_carry(table_set, mono60):
    """Production chunking (MCScanner.simulate / bench.py): two N/2 chunks
    linked by ``return_carry``/``carry_in`` must tally the same expected
    image as one N-history drained run. A carry that drops or resets the
    in-flight photons loses up to n_lanes histories' remaining tally at
    the chunk boundary (~10% of N here, far above the MC noise of this
    comparison), and also under-counts sourced histories."""
    from cbctmc_tpu.engine.transport import LaneState

    mats, dens = _scene(table_set, with_water_slab=True)
    run = _make_run(table_set, mono60, mats, dens)
    n = 160_000

    # single drained run, starting from the explicit cold carry so the
    # LaneState.empty == engine-cold-init equivalence is exercised too
    img_single = np.asarray(
        run(n, 3, carry_in=LaneState.empty(CONFIG.n_lanes, N_PIX * N_PIX)),
        np.float64,
    )

    # chunked: budget-exhausted first half hands survivors to the second
    img1, extras = run(n // 2, 4, carry_in=LaneState.empty(
        CONFIG.n_lanes, N_PIX * N_PIX), return_carry=True)
    carry = extras["carry"]
    # the boundary must actually be exercised: survivors in flight
    n_in_flight = int(np.asarray(carry.alive).sum()
                      + np.asarray(carry.pending).sum())
    assert n_in_flight > 1000
    img2 = run(n // 2, 5, carry_in=carry)
    img_chunked = np.asarray(img1, np.float64) + np.asarray(img2, np.float64)

    # expected tallied energy matches (different RNG streams -> MC noise;
    # a dropped carry shifts this by ~n_in_flight/n ~ 10%)
    assert img_chunked.sum() == pytest.approx(img_single.sum(), rel=0.02)
    # and the primary channel (sharpest statistics) matches tightly
    assert img_chunked[0].sum() == pytest.approx(img_single[0].sum(), rel=0.02)
