"""Hierarchy serialization (save/load built solvers).

The reference has no checkpointing (SURVEY.md §5: "A built
MultilevelSolver is an in-memory object ... users pickle it ad hoc");
since setup is the expensive phase, first-class save/load is added here:
level operators round-trip through a single compressed .npz, and
smoother specs are re-bound on load.
"""

from __future__ import annotations

import json

import numpy as np
import scipy.sparse as sp

__all__ = ["save_hierarchy", "load_hierarchy",
           "save_device_solver", "load_device_solver"]


def _pack_csr(prefix, M, out):
    M = sp.csr_matrix(M)
    out[f"{prefix}_data"] = M.data
    out[f"{prefix}_indices"] = M.indices
    out[f"{prefix}_indptr"] = M.indptr
    out[f"{prefix}_shape"] = np.asarray(M.shape)


def _unpack_csr(prefix, data):
    return sp.csr_matrix(
        (data[f"{prefix}_data"], data[f"{prefix}_indices"],
         data[f"{prefix}_indptr"]),
        shape=tuple(data[f"{prefix}_shape"]),
    )


def _jsonable_kwargs(kwargs):
    """Sanitize smoother-spec kwargs for json: numpy scalars -> python
    scalars, arrays -> lists; a kwarg that still won't serialize drops the
    whole spec to None (same policy as callables)."""
    clean = {}
    for key, val in dict(kwargs or {}).items():
        if isinstance(val, np.generic):
            val = val.item()
        elif isinstance(val, np.ndarray):
            val = val.tolist()
        try:
            json.dumps(val)
        except TypeError:
            return None
        clean[key] = val
    return clean


def save_hierarchy(ml, path):
    """Serialize a MultilevelSolver's levels + smoother specs to .npz."""
    out = {}
    meta = {"nlevels": len(ml.levels),
            "coarse_solver": ml.coarse_solver.name()}
    specs = []
    for i, lvl in enumerate(ml.levels):
        _pack_csr(f"A{i}", lvl.A, out)
        if getattr(lvl, "P", None) is not None:
            _pack_csr(f"P{i}", lvl.P, out)
        if getattr(lvl, "R", None) is not None:
            _pack_csr(f"R{i}", lvl.R, out)
        if getattr(lvl, "B", None) is not None:
            out[f"B{i}"] = np.asarray(lvl.B)
        if getattr(lvl, "splitting", None) is not None:
            out[f"splitting{i}"] = np.asarray(lvl.splitting)
        pre = getattr(lvl, "presmoother_spec", None)
        post = getattr(lvl, "postsmoother_spec", None)

        def enc(spec):
            if spec is None or spec[0] is None:
                return None
            if callable(spec[0]):
                return None  # custom callables are not serializable
            kwargs = _jsonable_kwargs(spec[1])
            if kwargs is None:
                return None
            return [spec[0], kwargs]

        specs.append({"pre": enc(pre), "post": enc(post)})
    meta["specs"] = specs
    out["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    np.savez_compressed(path, **out)


def load_hierarchy(path):
    """Load a MultilevelSolver saved with :func:`save_hierarchy`."""
    from ..multilevel import MultilevelSolver
    from ..relaxation.smoothing import change_smoothers

    data = np.load(path if str(path).endswith(".npz") else f"{path}.npz",
                   allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    levels = []
    for i in range(meta["nlevels"]):
        lvl = MultilevelSolver.Level()
        lvl.A = _unpack_csr(f"A{i}", data)
        if f"P{i}_data" in data:
            lvl.P = _unpack_csr(f"P{i}", data)
        if f"R{i}_data" in data:
            lvl.R = _unpack_csr(f"R{i}", data)
        if f"B{i}" in data:
            lvl.B = data[f"B{i}"]
        if f"splitting{i}" in data:
            lvl.splitting = data[f"splitting{i}"]
        levels.append(lvl)
    ml = MultilevelSolver(levels, coarse_solver=meta["coarse_solver"])
    # re-bind smoothers from stored specs
    nlev = len(levels)
    pres, posts = [], []
    for i, spec in enumerate(meta["specs"][: max(nlev - 1, 1)]):
        pres.append(tuple(spec["pre"]) if spec["pre"] else None)
        posts.append(tuple(spec["post"]) if spec["post"] else None)
    change_smoothers(ml, pres, posts)
    return ml


# ---------------------------------------------------------------------------
# device solver serialization (round-2 cont.)
# ---------------------------------------------------------------------------

def save_device_solver(ds, path):
    """Serialize a built DEVICE solver (DeviceMultilevelSolver /
    StructuredDeviceSolver) to a single file.

    Production pattern: the setup phase runs once (host or on-device
    pipeline), the compiled hierarchy is checkpointed, and serving
    processes ``load_device_solver`` it straight onto their accelerator —
    no re-setup, no scipy re-conversion.  Implementation: the hierarchy
    is a registered JAX pytree of arrays + static aux, so it pickles
    after pulling every leaf to host numpy (one D2H sweep at save time).

    The format is pickle: load only files you trust (same caveat as
    torch.save checkpoints).
    """
    import pickle

    import jax

    from ..engine.device_setup import StructuredDeviceSolver

    host_hier = jax.tree_util.tree_map(np.asarray, ds.hierarchy)
    payload = {"format": "pyamg_tpu-device-solver-v1",
               "hierarchy": host_hier}
    if isinstance(ds, StructuredDeviceSolver):
        payload["structured"] = {
            "grid": tuple(ds.grid),
            "grid_p": tuple(ds.grid_p),
            "setup_info": jax.tree_util.tree_map(np.asarray,
                                                 ds.setup_info),
        }
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_device_solver(path):
    """Load a device solver saved with :func:`save_device_solver`,
    staging every hierarchy leaf back onto the default device."""
    import pickle

    import jax
    import jax.numpy as jnp

    from ..engine.device_setup import StructuredDeviceSolver
    from ..engine.solver import DeviceMultilevelSolver

    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("format") != "pyamg_tpu-device-solver-v1":
        raise ValueError(f"{path} is not a pyamg_tpu device-solver file")
    # f64 leaves require x64 before staging (else silent downcast)
    leaves = jax.tree_util.tree_leaves(payload["hierarchy"])
    if any(np.asarray(leaf).dtype == np.float64 for leaf in leaves):
        jax.config.update("jax_enable_x64", True)
    hier = jax.tree_util.tree_map(jnp.asarray, payload["hierarchy"])
    info = payload.get("structured")
    if info is not None:
        return StructuredDeviceSolver(hier, info["grid"], info["grid_p"],
                                      setup_info=info["setup_info"])
    return DeviceMultilevelSolver(hier)
