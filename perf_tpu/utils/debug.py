"""Debug helpers (counterpart of the reference's ``utils/debug_utils.py``)."""

from __future__ import annotations

import numpy as np


def printarr(*arrays, names=None, file=None):
    """Pretty table of array stats (shape/dtype/min/max/mean/nan count).

    Works on jnp/np arrays and scalars; the reference's ``printarr`` pulls
    variable names from the caller frame — pass ``names`` explicitly here
    (frame inspection is brittle under jit).
    """
    import builtins
    rows = []
    for i, a in enumerate(arrays):
        name = names[i] if names and i < len(names) else f"arr{i}"
        try:
            a = np.asarray(a)
            rows.append((name, str(a.shape), str(a.dtype),
                         f"{a.min():.4g}" if a.size else "-",
                         f"{a.max():.4g}" if a.size else "-",
                         f"{a.mean():.4g}" if a.size else "-",
                         str(int(np.isnan(a).sum())) if a.size else "0"))
        except Exception:
            rows.append((name, "-", type(a).__name__, "-", "-", "-", "-"))
    header = ("name", "shape", "dtype", "min", "max", "mean", "nans")
    widths = [max(len(r[c]) for r in rows + [header]) for c in range(7)]
    fmt = "  ".join("{:>%d}" % w for w in widths)
    builtins.print(fmt.format(*header), file=file)
    for r in rows:
        builtins.print(fmt.format(*r), file=file)
