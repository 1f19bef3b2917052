"""config5 recipe scan (round 5, VERDICT item 1a).

Round 4's degree-2 energy switch was tuned on 256^2/512^2 HOST solves
(exact sequential GS-NR smoothing), but the bench's time-to-1e-8 is a
DEVICE solve where gauss_seidel_nr is substituted by the parallel
Cimmino sweep (engine/hierarchy.py:178-225).  At 1024^2 that hierarchy
regressed to conv 0.902 and never reached 1e-8.  This probe evaluates
candidate host recipes through the SAME device pipeline
(compile_hierarchy mixed + device BiCGStab) on the CPU backend, at the
REAL bench scale, so recipe choices predict the bench.

Usage:  python scripts/probe_config5.py [N] [recipe ...]
        (default N=1024; default = all recipes)
"""

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import pyamg_tpu  # noqa: E402
from pyamg_tpu.engine import DeviceMultilevelSolver, compile_hierarchy  # noqa: E402
from pyamg_tpu.gallery import recirc_flow  # noqa: E402


def base_kwargs():
    return dict(
        symmetry="nonsymmetric",
        strength="symmetric",
        improve_candidates=(("gauss_seidel_nr",
                             {"sweep": "symmetric", "iterations": 4}),
                            None),
        presmoother=("gauss_seidel_nr", {"sweep": "symmetric",
                                         "iterations": 2}),
        postsmoother=("gauss_seidel_nr", {"sweep": "symmetric",
                                          "iterations": 2}),
    )


def recipe(name):
    kw = base_kwargs()
    if name == "deg1":            # round-3 recipe (the known-good revert)
        kw["smooth"] = ("energy", {"krylov": "gmres", "maxiter": 3,
                                   "degree": 1})
    elif name == "deg2":          # round-4 regression (fidelity check)
        kw["smooth"] = ("energy", {"krylov": "gmres", "maxiter": 3,
                                   "degree": 2})
    elif name == "deg2_m2":
        kw["smooth"] = ("energy", {"krylov": "gmres", "maxiter": 2,
                                   "degree": 2})
    elif name == "deg1_pre3":
        kw["smooth"] = ("energy", {"krylov": "gmres", "maxiter": 3,
                                   "degree": 1})
        kw["presmoother"] = ("gauss_seidel_nr", {"sweep": "symmetric",
                                                 "iterations": 3})
        kw["postsmoother"] = ("gauss_seidel_nr", {"sweep": "symmetric",
                                                  "iterations": 3})
    elif name == "deg1_imp6":
        kw["smooth"] = ("energy", {"krylov": "gmres", "maxiter": 3,
                                   "degree": 1})
        kw["improve_candidates"] = (("gauss_seidel_nr",
                                     {"sweep": "symmetric",
                                      "iterations": 6}), None)
    elif name == "deg1_evo":
        kw["smooth"] = ("energy", {"krylov": "gmres", "maxiter": 3,
                                   "degree": 1})
        kw["strength"] = ("evolution", {"k": 2, "epsilon": 4.0})
    else:
        raise SystemExit(f"unknown recipe {name}")
    return kw


def run(name, n):
    A = recirc_flow((n, n), epsilon=1e-2)
    b = np.random.default_rng(4).random(A.shape[0])
    t0 = time.perf_counter()
    ml = pyamg_tpu.smoothed_aggregation_solver(A, **recipe(name))
    t_setup = time.perf_counter() - t0
    oc = float(ml.operator_complexity())
    import warnings

    import jax.numpy as jnp
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dml = DeviceMultilevelSolver(
            compile_hierarchy(ml, dtype=jnp.float32, mixed_precision=True,
                              coarse_cutoff=1024))
    res = []
    t0 = time.perf_counter()
    dml.solve(b, tol=1e-8, maxiter=100, accel="bicgstab",
              precision="mixed", residuals=res)
    t_solve = time.perf_counter() - t0
    rel = float(res[-1] / res[0]) if res and res[0] else None
    conv = (rel ** (1.0 / (len(res) - 1))) if rel else None
    out = {"recipe": name, "n": n * n, "setup_host_s": round(t_setup, 1),
           "oc": round(oc, 2), "iters": len(res) - 1,
           "final_relres": rel, "conv": round(conv, 3) if conv else None,
           "converged": bool(rel is not None and rel <= 1e-8),
           "solve_cpu_s": round(t_solve, 1)}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    n = 1024
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
    names = args or ["deg1", "deg2", "deg1_pre3", "deg1_imp6",
                     "deg2_m2", "deg1_evo"]
    for nm in names:
        try:
            run(nm, n)
        except Exception as e:  # keep scanning
            print(json.dumps({"recipe": nm, "error": str(e)[:200]}),
                  flush=True)
