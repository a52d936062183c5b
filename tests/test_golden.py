"""Golden regression test: the engine's statistical output on a fixed seed
must stay stable across refactors (tolerances absorb float-reassociation
differences between XLA versions but catch physics regressions).

The golden config pins the threefry PRNG (``rng_impl=None``) so the random
stream is backend-stable; the default engine config uses the faster XLA
RngBitGenerator whose stream may change between XLA releases.

Regenerate tests/golden_slab_values.json deliberately when a change is
*supposed* to alter the physics or the RNG stream (document why in the
commit): ``python tests/test_golden.py`` rewrites the file in place.

History: regenerated for engine v2 (round 2) - the raised sampler trip
counts (VERDICT item 4: the v1 trip-exhaustion bias committed ~0.4% of
Compton taus from rejected proposals) and the reorganised per-iteration RNG
consumption both shift the fixed-seed draw; 8-seed means of v1 and v2 agree
within statistics (verified during the rewrite).

Regenerated for engine v4 (round 4) - resolve-in-place consumes the
per-resolve uniforms on all lanes and the CDF spectrum sampler replaces the
Walker alias, shifting the fixed-seed stream; channel sums moved 0.3-3%
(within the statistics of 120k histories). Unlike earlier rounds this
regeneration is anchored by an independent check: the end-to-end scalar
oracle test (tests/test_oracle_end_to_end.py) passes on the same engine
build, so the new goldens are not self-referential."""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from test_transport import N_PIX, CONFIG, _scene, _simulate
from cbctmc_tpu.physics.materials import default_material_set
from cbctmc_tpu.physics.spectrum import Spectrum

GOLDEN_PATH = Path(__file__).parent / "golden_slab_values.json"
# event_fraction is pinned so that performance tuning of the default
# compaction budget (which reorders lane scheduling and hence the RNG
# stream) cannot shift the golden values.
GOLDEN_CONFIG = dataclasses.replace(
    CONFIG, rng_impl=None, event_fraction=0.35
)


def _golden_image():
    ts = default_material_set()
    mono = Spectrum(
        "mono60",
        np.array([59_995.0, 60_005.0], np.float32),
        np.array([1.0], np.float32),
    )
    mats, dens = _scene(ts, True)
    return _simulate(
        ts, mono, mats, dens, n_histories=120_000, seed=1234,
        config=GOLDEN_CONFIG,
    )


def test_golden_slab_projection():
    golden = json.loads(GOLDEN_PATH.read_text())
    img = _golden_image()

    for i, expected in enumerate(golden["channel_sums"]):
        assert img[i].sum() == pytest.approx(expected, rel=2e-3), f"channel {i}"
    assert img[0, 14:18, 14:18].sum() == pytest.approx(
        golden["primary_center"], rel=2e-3
    )
    assert int((img.sum(axis=0) > 0).sum()) == pytest.approx(
        golden["nonzero_pixels"], abs=8
    )


if __name__ == "__main__":  # regenerate the golden file
    img = _golden_image()
    GOLDEN_PATH.write_text(
        json.dumps(
            {
                "channel_sums": [float(img[i].sum()) for i in range(4)],
                "primary_center": float(img[0, 14:18, 14:18].sum()),
                "nonzero_pixels": int((img.sum(axis=0) > 0).sum()),
            },
            indent=2,
        )
    )
    print("regenerated", GOLDEN_PATH)
