"""Smoke test for device_unstructured_sa_setup on CPU (dev iteration).

Checks, on a P1 FEM stiffness matrix (genuinely non-grid sparsity):
 1. P (windowed) exported to scipy -> exact RAP vs the probed banded A_c
 2. end-to-end V-cycle convergence (rho) vs host SA on the same matrix
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import scipy.sparse as sp

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import pyamg_tpu
from pyamg_tpu.gallery import regular_triangle_mesh, gradgradform


def windowed_to_scipy(W):
    data = np.asarray(W.data)          # (nb, k, B)
    idx = np.asarray(W.idx)
    starts = np.asarray(W.starts)
    nb, k, B = data.shape
    rows = np.broadcast_to(
        (np.arange(nb) * B)[:, None, None]
        + np.arange(B)[None, None, :], data.shape).ravel()
    cols = (starts[:, None, None] * W.w2 + idx).ravel()
    vals = data.ravel()
    keep = vals != 0
    n, m = W.shape
    keep &= rows < n
    M = sp.coo_matrix((vals[keep], (rows[keep], cols[keep])),
                      shape=(n, max(m, int(cols[keep].max()) + 1 if keep.any() else m)))
    return sp.csr_matrix(M)[:, :m]


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    V, E = regular_triangle_mesh(nx, nx)
    A = gradgradform(V, E)
    A = sp.csr_matrix(A)
    n = A.shape[0]
    # pin a Dirichlet-ish condition so A is SPD
    A = A + 1e-2 * sp.eye(n, format="csr")
    print(f"n={n} nnz={A.nnz} bandwidth={abs(A.tocoo().row - A.tocoo().col).max()}")

    from pyamg_tpu.engine.unstructured_setup import device_unstructured_sa_setup
    t0 = time.time()
    dsa = device_unstructured_sa_setup(A, max_coarse=300)
    t1 = time.time()
    h = dsa.hierarchy
    print(f"setup {t1-t0:.2f}s, levels: "
          + str([(l.n, type(l.A).__name__) for l in h.levels]))
    print("setup_info:", dsa.setup_info)

    # --- check level-1 operator vs exact scipy RAP --------------------
    lvl0 = h.levels[0]
    P = lvl0.P
    P_sp = windowed_to_scipy(P)
    print(f"P: shape={P_sp.shape} nnz={P_sp.nnz}")
    n1 = h.levels[1].n
    P_sp = P_sp[:, :n1] if P_sp.shape[1] >= n1 else P_sp
    RAP = (P_sp.T @ A @ P_sp).tocsr()
    A1 = h.levels[1].A
    if type(A1).__name__ == "DenseOperator":
        A1_sp = sp.csr_matrix(np.asarray(A1.data)[:n1, :n1])
    else:
        A1_sp = windowed_to_scipy(A1)[:n1, :n1]
    diff = (RAP - A1_sp)
    num = abs(diff).max() if diff.nnz else 0.0
    den = abs(RAP).max()
    print(f"RAP entrywise: max|diff|={num:.3e} rel={num/den:.3e} "
          f"(RAP nnz={RAP.nnz}, device nnz={A1_sp.nnz})")

    # --- convergence -------------------------------------------------
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    residuals = []
    x = dsa.solve(b, tol=1e-8, maxiter=60, accel="cg",
                  residuals=residuals)
    res = np.asarray(residuals)
    res = res[~np.isnan(res)]
    iters = len(res) - 1
    rho = (res[-1] / res[0]) ** (1.0 / max(iters, 1))
    r_true = np.linalg.norm(b - jnp.asarray(A @ np.asarray(x[:n])))
    print(f"device CG: iters={iters} rho={rho:.3f} true_res={r_true:.3e}")

    # host comparison
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    ml = smoothed_aggregation_solver(A, max_coarse=300)
    res_h = []
    xh = ml.solve(np.asarray(b), tol=1e-8, maxiter=60, accel="cg",
                  residuals=res_h)
    print(f"host SA: iters={len(res_h)-1} "
          f"rho={(res_h[-1]/res_h[0])**(1/max(len(res_h)-1,1)):.3f}")


if __name__ == "__main__":
    main()
