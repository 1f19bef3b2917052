"""Round-2 TPU revalidation: run once when the relay returns.

Order matters: tiny sacrificial sync first (absorbs any stale-lease
penalty), then the never-on-TPU codepaths (fused multi-RHS windowed
kernel under real Mosaic, batched V-cycle, classical/AIR device setup),
then `python bench.py 1024` separately to re-warm the persistent
compile cache before the driver's timed run.

Writes one status line per stage so a partial failure is attributable.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage(name):
    print(f"[{time.strftime('%H:%M:%S')}] {name}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    stage("sacrificial sync...")
    t0 = time.time()
    print("  sum:", float(jnp.sum(jnp.ones((8,)))),
          f"({time.time()-t0:.1f}s)", flush=True)
    print("  backend:", jax.default_backend(), jax.devices(), flush=True)
    if jax.default_backend() != "tpu":
        print("NOT ON TPU — aborting")
        return 1

    # ---- fused multi-RHS windowed kernel under real Mosaic ----------
    stage("fused windowed matmat (Mosaic)...")
    import scipy.sparse as sp

    from pyamg_tpu.sparse import windowed_from_scipy

    P = sp.random(4096, 1500, density=0.002, random_state=3,
                  format="csr") + sp.eye(4096, 1500) * 0.5
    W = windowed_from_scipy(sp.csr_matrix(P), block=256)
    K = 8
    X = jnp.asarray(np.random.default_rng(0).random(
        (W.m_chunks * W.w2, K)), dtype=jnp.float32)
    try:
        Y = np.asarray(W._matmat_pallas(X))
        Yref = np.stack([np.asarray(W._matvec_reference(X[:, j]))
                         for j in range(K)], axis=1)
        rel = np.max(np.abs(Y - Yref)) / np.max(np.abs(Yref))
        print(f"  fused matmat reldiff {rel:.2e} "
              f"({'OK' if rel < 1e-5 else 'MISMATCH'})", flush=True)
    except Exception as e:
        print(f"  fused matmat FAILED on Mosaic: {type(e).__name__}: "
              f"{e}"[:300], flush=True)

    # ---- batched multi-RHS solve end-to-end -------------------------
    stage("batched multi-RHS device solve (512^2)...")
    import pyamg_tpu
    from pyamg_tpu.engine import compile_hierarchy
    from pyamg_tpu.engine.solver import DeviceMultilevelSolver
    from pyamg_tpu.gallery import poisson

    A = poisson((512, 512), format="csr")
    ml = pyamg_tpu.smoothed_aggregation_solver(A)
    dml = DeviceMultilevelSolver(compile_hierarchy(ml))
    B = np.random.default_rng(1).random((A.shape[0], K))
    t0 = time.time()
    Xs = dml.solve(B, tol=1e-5, maxiter=40, accel="cg", device_out=True)
    t_first = time.time() - t0
    t0 = time.time()
    Xs = dml.solve(B, tol=1e-5, maxiter=40, accel="cg", device_out=True)
    t_warm = time.time() - t0
    Xh = np.asarray(Xs)
    r = np.linalg.norm(B - A @ Xh, axis=0) / np.linalg.norm(B, axis=0)
    print(f"  K={K}: warm {t_warm:.3f}s (first {t_first:.1f}s), "
          f"max relres {r.max():.2e}", flush=True)
    x1 = dml.solve(B[:, 0], tol=1e-5, maxiter=40)
    print(f"  single-RHS warm check relres "
          f"{np.linalg.norm(B[:,0]-A@x1)/np.linalg.norm(B[:,0]):.2e}",
          flush=True)

    # ---- classical device setups ------------------------------------
    stage("device RS setup (512^2 anisotropic)...")
    from pyamg_tpu.engine import device_air_setup, device_rs_setup
    from pyamg_tpu.gallery import advection_2d, diffusion_stencil_2d, \
        stencil_grid

    S3 = diffusion_stencil_2d(epsilon=1e-3, theta=0.0, type="FD")
    A3 = stencil_grid(S3, (512, 512)).tocsr()
    t0 = time.time()
    drs = device_rs_setup(A3, grid=(512, 512), max_coarse=400)
    float(drs.hierarchy.coarse_inv[0, 0])
    t_cold = time.time() - t0
    t0 = time.time()
    drs = device_rs_setup(A3, grid=(512, 512), max_coarse=400)
    float(drs.hierarchy.coarse_inv[0, 0])
    t_warm = time.time() - t0
    b3 = np.random.default_rng(2).random(A3.shape[0])
    res = []
    drs.solve(b3, tol=1e-5, maxiter=60, accel="cg", residuals=res)
    print(f"  RS setup cold {t_cold:.1f}s warm {t_warm:.3f}s, "
          f"{len(res)-1} CG iters to 1e-5", flush=True)

    stage("device AIR setup (256^2 advection)...")
    Aair, bair = advection_2d((256, 256), theta=np.pi / 4)
    t0 = time.time()
    dair = device_air_setup(Aair, grid=(256, 256), max_coarse=400)
    float(dair.hierarchy.coarse_inv[0, 0])
    t_cold = time.time() - t0
    t0 = time.time()
    dair = device_air_setup(Aair, grid=(256, 256), max_coarse=400)
    float(dair.hierarchy.coarse_inv[0, 0])
    t_warm = time.time() - t0
    res = []
    dair.solve(bair, tol=1e-8, maxiter=5, residuals=res)
    drop = res[0] / res[1] if len(res) > 1 and res[1] else float("inf")
    print(f"  AIR setup cold {t_cold:.1f}s warm {t_warm:.3f}s, "
          f"first-cycle drop {drop:.1e}", flush=True)

    stage("done — now run: python bench.py 1024, then python bench.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
