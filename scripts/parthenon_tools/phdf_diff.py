"""Compare two Parthenon-format dumps dataset-by-dataset.

Clean-room implementation of the public ``parthenon_tools.phdf_diff``
``compare()`` entry point as called by the reference suites, e.g.
``tst/regression/test_suites/cluster_hse/cluster_hse.py:521``:

  compare(files, check_metadata=False, tol=5e-2, relative=True,
          quiet=False, one=True)

Returns 0 when the files agree (within ``tol``), nonzero otherwise.
``one=True`` uses a max(|gold|, 1)-style denominator floor for the
relative error so near-zero fields don't blow up the ratio.
"""

import numpy as np

from . import phdf


def compare_metadata(d0, d1, quiet=False):
    errs = 0
    for attr in ("NumBlocks", "MaxLevel", "NumDims"):
        if getattr(d0, attr) != getattr(d1, attr):
            errs += 1
            if not quiet:
                print(f"Metadata mismatch: {attr}: "
                      f"{getattr(d0, attr)} vs {getattr(d1, attr)}")
    if not np.array_equal(d0.MeshBlockSize, d1.MeshBlockSize):
        errs += 1
        if not quiet:
            print("Metadata mismatch: MeshBlockSize")
    if sorted(d0.Variables) != sorted(d1.Variables):
        errs += 1
        if not quiet:
            print(f"Metadata mismatch: Variables: {d0.Variables} vs "
                  f"{d1.Variables}")
    return errs


def compare(files, brief=False, quiet=False, one=False, tol=1.0e-12,
            check_metadata=True, relative=False):
    """Diff ``files[0]`` (gold) against ``files[1]``; 0 == match."""
    assert len(files) == 2, "phdf_diff.compare expects exactly two files"
    d0 = phdf.phdf(files[0])
    d1 = phdf.phdf(files[1])

    errs = 0
    if check_metadata:
        errs += compare_metadata(d0, d1, quiet=quiet)

    common = [v for v in d0.Variables if v in d1.Variables]
    for var in common:
        a = d0.Get(var, flatten=False).astype(np.float64)
        b = d1.Get(var, flatten=False).astype(np.float64)
        if a.shape != b.shape:
            errs += 1
            if not quiet:
                print(f"{var}: shape mismatch {a.shape} vs {b.shape}")
            continue
        delta = np.abs(a - b)
        if relative:
            denom = np.abs(a)
            if one:
                denom = np.maximum(denom, 1.0)
            else:
                denom = np.where(denom == 0.0, 1.0, denom)
            delta = delta / denom
        max_err = float(delta.max()) if delta.size else 0.0
        if max_err > tol:
            errs += 1
            if not quiet:
                kind = "relative" if relative else "absolute"
                print(f"{var}: max {kind} error {max_err:.6e} > tol "
                      f"{tol:.6e}")
        elif not quiet:
            print(f"{var}: OK (max err {max_err:.3e})")
    return errs
