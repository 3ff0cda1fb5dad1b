"""Compare a Parthenon-format dump against analytic component functions.

Clean-room implementation of the public
``parthenon_tools.compare_analytic`` API as called by the reference
suites (``tst/regression/test_suites/cluster_hse/cluster_hse.py:549``):

  compare_analytic(filename,
                   {component: fn(Z, Y, X, time) -> gold array},
                   err_func=..., tol=...)

Returns True when every listed component's error (per ``err_func``)
is below ``tol``.
"""

import numpy as np

from . import phdf


def norm_err_func(gold, test, norm_ord=2, relative=False,
                  ignore_gold_zero=True):
    """||gold - test|| / optional ||gold|| normalization.

    ``relative``: divide elementwise by |gold| before taking the norm.
    ``ignore_gold_zero``: drop entries where gold == 0 (so a relative
    error is well-defined).
    """
    gold = np.asarray(gold, np.float64).ravel()
    test = np.asarray(test, np.float64).ravel()
    if relative:
        mask = gold != 0.0
        if ignore_gold_zero:
            gold, test = gold[mask], test[mask]
        else:
            if not mask.all():
                return np.inf if np.any(gold[~mask] != test[~mask]) \
                    else norm_err_func(gold[mask], test[mask], norm_ord,
                                       relative, True)
        err = (gold - test) / gold
        return float(np.linalg.norm(err, ord=norm_ord))
    return float(np.linalg.norm(gold - test, ord=norm_ord))


def compare_analytic(filename, analytic_components, err_func=None,
                     tol=1.0e-12, quiet=False):
    if err_func is None:
        err_func = norm_err_func
    data = phdf.phdf(filename)
    zz, yy, xx = data.GetVolumeLocations()
    components = data.GetComponents(list(analytic_components.keys()),
                                    flatten=True)
    ok = True
    for comp, fn in analytic_components.items():
        gold = np.asarray(fn(zz, yy, xx, data.Time), np.float64)
        test = np.asarray(components[comp], np.float64)
        err = err_func(gold, test)
        if err > tol:
            ok = False
            if not quiet:
                print(f"compare_analytic: {comp} err {err:.6e} > tol "
                      f"{tol:.6e}")
        elif not quiet:
            print(f"compare_analytic: {comp} OK (err {err:.3e})")
    return ok
