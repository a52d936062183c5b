"""Parameter checkpointing (replaces the reference's torch .pth state dicts,
e.g. assets/models/{segmenter,speedup}/default.pth)."""

from __future__ import annotations

from pathlib import Path

import flax.serialization
import jax


def save_params(params, filepath) -> Path:
    filepath = Path(filepath)
    filepath.parent.mkdir(parents=True, exist_ok=True)
    payload = flax.serialization.to_bytes(jax.device_get(params))
    filepath.write_bytes(payload)
    return filepath


def load_params(template_params, filepath):
    """Load into the structure of template_params (e.g. from model.init)."""
    data = Path(filepath).read_bytes()
    return flax.serialization.from_bytes(template_params, data)


def publish_weights(ckpt_path, asset_dir, eval_report, gate) -> bool:
    """Publish a checkpoint as a packaged default asset, gated on a metric.

    The reference ships assets/models/{segmenter,speedup}/default.pth with no
    quality record; round 2 demonstrated why that is dangerous (a speedup
    checkpoint with a measured -12.5 dB holdout PSNR gain was published and
    became the silent CLI default).  Here publication REQUIRES a passing
    holdout metric: ``gate`` maps the eval report to (passed: bool, reason),
    and the asset is only written when it passes.  The eval report is stored
    alongside the weights as ``default.eval.json`` — consumers (the CLI)
    refuse to auto-default to weights that lack a passing stamp.
    """
    import json
    import shutil

    asset_dir = Path(asset_dir)
    passed, reason = gate(eval_report)
    if not passed:
        print(
            f"NOT publishing {ckpt_path}: quality gate failed ({reason}); "
            f"existing asset in {asset_dir} left untouched",
            flush=True,
        )
        return False
    asset_dir.mkdir(parents=True, exist_ok=True)
    target = asset_dir / "default.ckpt"
    # re-stamping the packaged asset in place passes ckpt_path == target
    if Path(ckpt_path).resolve() != target.resolve():
        shutil.copy(ckpt_path, target)
    stamp = dict(eval_report)
    stamp["quality_gate"] = {"passed": True, "reason": reason}
    (asset_dir / "default.eval.json").write_text(json.dumps(stamp, indent=2))
    print(f"published {asset_dir / 'default.ckpt'} ({reason})", flush=True)
    return True


def asset_has_passing_stamp(asset_dir) -> bool:
    """True iff asset_dir holds default.ckpt plus a passing default.eval.json.

    Used by the CLI to decide whether packaged weights may be a silent
    default; weights without a recorded passing holdout metric must be
    requested explicitly.
    """
    import json

    asset_dir = Path(asset_dir)
    ckpt = asset_dir / "default.ckpt"
    stamp = asset_dir / "default.eval.json"
    if not (ckpt.is_file() and stamp.is_file()):
        return False
    try:
        payload = json.loads(stamp.read_text())
    except (OSError, ValueError):
        return False
    return bool(payload.get("quality_gate", {}).get("passed"))
