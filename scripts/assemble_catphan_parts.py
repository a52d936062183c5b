"""Assemble (possibly partial) interleaved CatPhan simulation parts into an
angle-ordered stack + the matching angle list for the acceptance report."""
import sys
from pathlib import Path

import numpy as np

folder = Path(sys.argv[1])
order = np.load(folder / "order.npy")
parts, covered = [], []
i = 0
while (folder / f"part_{i:04d}.npy").is_file():
    parts.append(np.load(folder / f"part_{i:04d}.npy"))
    covered.extend(order[i : i + parts[-1].shape[0]])
    i += parts[-1].shape[0]
stack = np.concatenate(parts, axis=0)
covered = np.asarray(covered)
sort = np.argsort(covered)
np.save(folder / "images.npy", stack[sort])
np.save(folder / "angle_indices.npy", covered[sort])
print(f"assembled {len(covered)} projections (of the planned arc) ->",
      folder / "images.npy")
