"""Golden regression test: the engine's statistical output on a fixed seed
must stay stable across refactors (tolerances absorb float-reassociation
differences between XLA versions but catch physics regressions).

Regenerate tests/golden_slab_values.json deliberately when a change is
*supposed* to alter the physics (document why in the commit)."""

import json
from pathlib import Path

import numpy as np
import pytest

from test_transport import N_PIX, _scene, _simulate
from cbctmc_tpu.physics.materials import default_material_set
from cbctmc_tpu.physics.spectrum import Spectrum


def test_golden_slab_projection():
    golden = json.loads(
        (Path(__file__).parent / "golden_slab_values.json").read_text()
    )
    ts = default_material_set()
    mono = Spectrum(
        "mono60",
        np.array([59_995.0, 60_005.0], np.float32),
        np.array([1.0], np.float32),
    )
    mats, dens = _scene(ts, True)
    img = _simulate(ts, mono, mats, dens, n_histories=120_000, seed=1234)

    for i, expected in enumerate(golden["channel_sums"]):
        assert img[i].sum() == pytest.approx(expected, rel=2e-3), f"channel {i}"
    assert img[0, 14:18, 14:18].sum() == pytest.approx(
        golden["primary_center"], rel=2e-3
    )
    assert int((img.sum(axis=0) > 0).sum()) == pytest.approx(
        golden["nonzero_pixels"], abs=8
    )
