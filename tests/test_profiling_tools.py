"""Tests for the attributed-profile tooling (scripts/profile_engine.py):
HLO computation splitting and kernel attribution on a real compiled
module. The census side is covered by utils/profiling.py usage in the
engine optimisation workflow (docs/ROADMAP.md)."""

import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).parent.parent


def _load_profile_engine():
    spec = importlib.util.spec_from_file_location(
        "profile_engine", REPO / "scripts" / "profile_engine.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["profile_engine"] = mod
    spec.loader.exec_module(mod)
    return mod


def _compiled_hlo():
    def f(x, y):
        return jnp.tanh(x @ y) + jnp.sin(x).sum()

    x = jnp.ones((64, 64), jnp.float32)
    return jax.jit(f).lower(x, x).compile().as_text()


def test_split_hlo_computations_finds_entry_and_instructions():
    pe = _load_profile_engine()
    hlo = _compiled_hlo()
    bodies = pe.split_hlo_computations(hlo)
    assert bodies, "no computations parsed"
    # the entry computation must contain at least one instruction line
    assert any(
        any("=" in line for line in lines) for lines in bodies.values()
    )


def test_attribute_kernel_resolves_fusion_or_reports_missing():
    pe = _load_profile_engine()
    hlo = _compiled_hlo()
    bodies = pe.split_hlo_computations(hlo)
    # a name that certainly does not exist
    assert pe.attribute_kernel("fusion.999999", bodies) == {"found": False}
    # find a real instruction name in the entry computation and attribute it
    import re

    names = []
    for lines in bodies.values():
        for line in lines:
            m = re.match(r"\s*(?:ROOT\s+)?%([\w.\-]+)\s*=", line)
            if m and "parameter" not in line:
                names.append(m.group(1))
    assert names
    attributed = [pe.attribute_kernel(n, bodies) for n in names[:10]]
    assert any(a.get("found") for a in attributed)
