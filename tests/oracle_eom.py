"""Loader for the reference's shipped lambdified GRF-EOM blobs.

``models/<name>_grf_eom`` are dill dumps of 6 lambdified base-DOF equations of
motion produced by ``CheetahEstimator.calc_grf_eom`` (acinoset_opt.py:120-174).
Their closures reference pyomo / reference-module names that are absent here,
so we install minimal module stubs (plain math functions) before unpickling.
Each entry is f(vars) with vars = q(54) + dq(54) + ddq(54) + Lz(4 feet) +
Lx(4 feet x 4 polygon dirs), forces in body-weight units.
"""
import math
import sys
import types

_STUBBED = False


def _mkmod(name):
    m = types.ModuleType(name)
    m.__path__ = []
    sys.modules.setdefault(name, m)
    return sys.modules[name]


def _install_stubs():
    global _STUBBED
    if _STUBBED:
        return
    for n in ("pyomo", "pyomo.core", "pyomo.core.expr", "pyomo.environ",
              "pyomo.core.expr.current", "acinoset_opt", "shared",
              "shared.physical_education",
              "shared.physical_education.utils"):
        _mkmod(n)
    for modn in ("pyomo.core.expr.current", "pyomo.environ"):
        mod = sys.modules[modn]
        for fn in ("sin", "cos", "tan", "asin", "acos", "atan", "exp",
                   "log", "sqrt", "sinh", "cosh", "tanh"):
            if not hasattr(mod, fn):
                setattr(mod, fn, getattr(math, fn))
    _STUBBED = True


def load_grf_eom(path):
    _install_stubs()
    import dill
    with open(path, "rb") as f:
        return dill.load(f)


def eval_oracle(eom, q, dq, ddq, grf_z, grf_xy):
    """Evaluate the 6 oracle rows. grf_z (4,), grf_xy (4,4)."""
    import numpy as np
    v = list(q) + list(dq) + list(ddq) + list(grf_z) + \
        [x for row in grf_xy for x in row]
    return np.array([f(v) for f in eom])
