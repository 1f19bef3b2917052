"""Benchmark: all five BASELINE.json configs on the default backend (TPU).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Headline (series continuity with round 1): config-1 V-cycle throughput in
work-nnz/s on SA/2D-Poisson.  ``vs_baseline`` compares against the
reference's compute substrate measured in-process: the same V-cycle run
through the host SciPy/C++ path on this machine's CPU.

Honest-metrics note (round-1 verdict): the headline "Gnnz/s" is a WORK
metric — cycle_nnz counts 3*nnz per level (pre+post smoothing + residual)
plus P/R applications plus the dense coarse solve — not a bandwidth.  The
roofline number is ``detail.config1.spmv_gnnz_s`` (raw finest-level SpMV
nnz/s; ~f32 DIA speed-of-light on this chip's HBM).

Phases: (A) f32 metrics for every config FIRST (x64 mode adds ~1 ms fixed
dispatch overhead per call on this backend), then (B) x64 mixed-precision
time-to-1e-8 solves.
"""

from __future__ import annotations

import json
import sys
import time
import warnings

import numpy as np


def _median_time(fn, repeats=7, warmup=2):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _factor(res):
    res = np.asarray(res, dtype=float)
    if len(res) < 2 or res[0] == 0:
        return None
    return float((res[-1] / res[0]) ** (1.0 / (len(res) - 1)))


def _cycle_nnz(ml):
    nnz = 0
    for lvl in ml.levels[:-1]:
        nnz += 3 * lvl.A.nnz + lvl.P.nnz + lvl.R.nnz
    nnz += ml.levels[-1].A.shape[0] ** 2
    return int(nnz)


def _measure_rtt(jax, jnp):
    """Relay/tunnel roundtrip latency for a trivial dispatch (reported so
    per-call numbers can be judged against the environment's floor —
    measured round 2: the axon tunnel RTT varies from <0.2 ms to ~25 ms
    between sessions)."""
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((8,), dtype=jnp.float32)
    float(f(x)[0])
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(x)[0])      # D2H pull = the only reliable sync on axon
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _chained_time(jax, jnp, step, op, v0, k=128, repeats=3):
    """Median per-step time of a k-long DEPENDENT on-device chain.

    One dispatch roundtrip per k steps, so the measurement reflects chip
    time, not tunnel RTT — the same amortization a real solve gets (the
    whole Krylov loop is one program).  ``step`` is (op, v) -> v and
    ``op`` (the operator/hierarchy pytree) flows as a JIT ARGUMENT —
    closure-captured device arrays are re-uploaded per call on this
    backend (CLAUDE.md rule 2)."""
    from jax import lax

    # NOTE: on the axon backend block_until_ready can return before
    # execution finishes; a scalar D2H pull is the only reliable sync,
    # so the chain returns a reduction and we time through float().
    chain = jax.jit(
        lambda o, v: jnp.sum(
            lax.fori_loop(0, k, lambda i, u: step(o, u), v)))
    float(chain(op, v0))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chain(op, v0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k


def _solve_fields(t, res, tol=1e-8, prefix="", rtt=0.0):
    """Convergence-honest solve reporting (round 5, VERDICT item 1b).

    The ``*time_to_1e8_s`` key exists ONLY when the final relative
    residual actually met the tolerance; an unconverged run gets
    ``*time_unconverged_s`` plus ``converged: false`` so no downstream
    table (README generator included) can claim convergence that did
    not happen — round 4 shipped "0.99 s to 1e-8" over a maxiter-capped
    3.3e-5 residual exactly because the time key's name lied."""
    rel = float(res[-1] / res[0]) if len(res) > 1 and res[0] else None
    ok = bool(rel is not None and rel <= tol)
    out = {prefix + "converged": ok, prefix + "final_relres": rel}
    if ok:
        out[prefix + "time_to_1e8_s"] = round(t, 3)
        out[prefix + "iters_to_1e8"] = len(res) - 1
    else:
        out[prefix + "time_unconverged_s"] = round(t, 3)
        out[prefix + "iters_run"] = len(res) - 1
    if rtt:
        # a device-resident solve is ONE dispatch (the whole Krylov
        # loop is one program; the history pull is the sync), so wall
        # minus one RTT is the chip time — cross-session comparisons
        # must use this (VERDICT r4 item 9: config4's 0.069->0.101 s
        # "drift" was mostly session RTT)
        out[prefix + ("time_to_1e8_net_s" if ok
                      else "time_unconverged_net_s")] = round(
            max(t - rtt, 0.0), 3)
    return out


def _timed_device_solve(dml, b, **kw):
    """Compile (untimed), then time one full device-resident solve.

    The RHS is staged on device once and the solution stays on device
    (device_out) — the ~22 MB/s relay D2H pull of a 4.2M-unknown x would
    otherwise dominate the measurement.  The history pull inside solve()
    is the reliable scalar-ish sync on this backend."""
    import jax.numpy as jnp

    dtype = (jnp.float64 if kw.get("precision") == "mixed"
             else dml.hierarchy.dtype)
    b_dev = jnp.asarray(np.asarray(b).ravel(), dtype=dtype)
    float(jnp.sum(jnp.abs(b_dev)))          # materialize the upload
    res = []
    dml.solve(b_dev, residuals=res, device_out=True, **kw)
    t0 = time.perf_counter()
    res = []
    x = dml.solve(b_dev, residuals=res, device_out=True, **kw)
    return time.perf_counter() - t0, res, x


def _relay_health_preprobe(timeout_s=180):
    """Probe backend health in a SUBPROCESS with a hard timeout.

    A dead relay makes in-process axon init block ~25 minutes before
    raising (measured); probing out-of-process caps the stall so the
    driver's bench either starts on TPU promptly or falls back to CPU
    within ~3 minutes.  A healthy relay initializes in seconds, so a
    timeout here almost certainly means no live lease exists to poison
    (CLAUDE.md process-hygiene note).
    """
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print(jax.default_backend())"],
            timeout=timeout_s, capture_output=True, text=True)
        if probe.returncode == 0:
            return probe.stdout.strip().splitlines()[-1]
        print(f"backend preprobe failed: {probe.stderr[-200:]}",
              file=sys.stderr, flush=True)
        return None
    except subprocess.TimeoutExpired:
        print(f"backend preprobe timed out after {timeout_s}s",
              file=sys.stderr, flush=True)
        return None


def main(grid=(2048, 2048), verbose=False):
    import jax
    import jax.numpy as jnp

    if _relay_health_preprobe() is None:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def note(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    import pyamg_tpu
    from pyamg_tpu.engine import (DeviceMultilevelSolver, compile_hierarchy,
                                  device_sa_setup)
    from pyamg_tpu.gallery import (diffusion_stencil_2d, linear_elasticity,
                                   poisson, recirc_flow, stencil_grid)
    from pyamg_tpu.sparse import dia_from_stencil

    # Explicitly-requested platforms ("axon,cpu" via the site hook) do
    # NOT fall back when the first one fails — a dead relay raises
    # RuntimeError out of backend init and the driver would get no JSON
    # at all.  Catch and force CPU so the contract survives an outage.
    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        print(f"backend init failed ({str(e)[:120]}); forcing CPU",
              file=sys.stderr, flush=True)
        jax.config.update("jax_platforms", "cpu")
        backend = jax.default_backend()
    detail = {"backend": backend, "chips": jax.device_count()}
    if backend != "tpu" and grid == (2048, 2048):
        # relay down -> axon fails -> jax falls back to CPU: the full
        # 2048^2 run (x64 phase B especially) would take hours there.
        # Shrink so the driver still gets a complete, honestly-labeled
        # JSON (backend + grid are both in the metric string).
        grid = (512, 512)
        detail["backend_fallback"] = (
            "TPU backend unavailable; grid shrunk to 512^2 so the CPU "
            "run completes")
    _mixed = []   # (name, host_ml, b, solve_kwargs) queued for phase B

    # ================= config 1: 2D Poisson, SA + CG, Jacobi ============
    note("config1: building problem...")
    A = poisson(grid, format="csr")
    note("config1: host setup...")
    t0 = time.perf_counter()
    ml = pyamg_tpu.smoothed_aggregation_solver(
        A,
        presmoother=("jacobi", {"omega": 4.0 / 3.0}),
        postsmoother=("jacobi", {"omega": 4.0 / 3.0}),
    )
    t_host_setup = time.perf_counter() - t0
    cycle_nnz = _cycle_nnz(ml)

    note("config1: device compile...")
    dml = DeviceMultilevelSolver(compile_hierarchy(ml, dtype=jnp.float32,
                                                 coarse_cutoff=1024))
    n_pad = dml.hierarchy.levels[0].n_pad
    b_h = np.random.default_rng(0).random(n_pad)   # host copy: reused
    b = jnp.asarray(b_h, dtype=jnp.float32)        # below without D2H

    rtt = _measure_rtt(jax, jnp)
    note(f"tunnel RTT: {rtt*1e3:.2f} ms")

    def net(t, k):
        # Net-of-dispatch chip time (round 5, VERDICT item 7): a k-long
        # chain still pays ONE dispatch roundtrip, so raw/k carries
        # RTT/k of pure tunnel latency (25 ms RTT / k=64 inflated every
        # round-4 cycle number by ~0.4 ms).  Derived throughputs and
        # `*_net_ms` keys use this; raw keys stay for series continuity.
        return max(t - rtt / k, 1e-12)

    from pyamg_tpu.engine.solver import _make_cycle
    one_cycle = _make_cycle(len(dml.hierarchy.levels), "V")
    h = dml.hierarchy
    t_cycle_raw = _chained_time(
        jax, jnp, lambda o, v: one_cycle(o, jnp.zeros_like(v), v), h, b,
        k=64)
    t_cycle = net(t_cycle_raw, 64)
    vcycle_nnz_s = cycle_nnz / t_cycle

    A_dev = dml.hierarchy.levels[0].A
    t_spmv_raw = _chained_time(jax, jnp, lambda o, v: o @ v, A_dev, b,
                               k=256)
    t_spmv = net(t_spmv_raw, 256)
    spmv_nnz_s = A.nnz / t_spmv

    # HBM roofline anchor (round 4, VERDICT item 2): the chip's measured
    # achievable bandwidth via a triad chain (2 reads + 1 write), and
    # the SpMV's fraction of it.  For a bandwidth-bound library this —
    # not MFU and not the datasheet number — is the honest perf
    # statement; round 3 quoted 43% of the v5e datasheet peak where the
    # measured achievable triad is ~405 GB/s and the SpMV runs at ~91%
    # of it.
    Nbw = 2048 * 2048 * 8
    big = jnp.ones(Nbw, dtype=jnp.float32)
    b2 = jnp.full(Nbw, 0.5, dtype=jnp.float32)
    t_triad = net(_chained_time(jax, jnp, lambda o, u: u + o * 1e-9, b2,
                                big, k=64), 64)
    triad_gbs = 3 * Nbw * 4 / t_triad / 1e9
    ndiags_f = getattr(A_dev, "ndiags", 5)
    spmv_traffic = (ndiags_f * A_dev.n_pad + 2 * A_dev.n_pad) * 4
    spmv_gbs = spmv_traffic / t_spmv / 1e9
    spmv_frac_of_peak = spmv_gbs / triad_gbs

    # host (reference-substrate) V-cycle throughput
    bh = b_h[: A.shape[0]].astype(np.float64)
    xh = np.zeros_like(bh)
    t_host = _median_time(
        lambda: ml.solve(bh, x0=xh, maxiter=1, tol=1e-300, accel=None),
        repeats=3, warmup=1)
    host_nnz_s = cycle_nnz / t_host

    # --- DEVICE SETUP (round-2): full on-device hierarchy construction ---
    note("config1: device setup path...")
    S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
    A_dia = dia_from_stencil(S1, grid, dtype=jnp.float32)
    dsa = device_sa_setup(A_dia, grid=grid, dtype=jnp.float32,
                          max_coarse=400)     # compile (untimed)
    float(dsa.hierarchy.coarse_inv[0, 0])     # hard sync
    t0 = time.perf_counter()
    dsa = device_sa_setup(A_dia, grid=grid, dtype=jnp.float32,
                          max_coarse=400)
    float(dsa.hierarchy.coarse_inv[0, 0])     # hard sync incl. D2H
    t_dev_setup = time.perf_counter() - t0
    res_ds = []
    dsa.solve(b_h[: A.shape[0]], tol=1e-5, maxiter=40,
              accel="cg", residuals=res_ds)
    # V-cycle throughput of the device-built hierarchy (structured
    # rolled P/R instead of the windowed one-hot kernel)
    one_cycle_ds = _make_cycle(len(dsa.hierarchy.levels), "V")
    h_ds = dsa.hierarchy
    b_ds = jnp.asarray(np.random.default_rng(0).random(
        dsa.hierarchy.levels[0].n_pad), dtype=jnp.float32)
    t_cycle_ds_raw = _chained_time(
        jax, jnp, lambda o, v: one_cycle_ds(o, jnp.zeros_like(v), v),
        h_ds, b_ds, k=64)
    t_cycle_ds = net(t_cycle_ds_raw, 64)

    # --- batched multi-RHS (round-2 cont.): K lanes through one vmapped
    # cycle; SpMV/transfer applies fuse to (n_pad, K) passes, so the
    # operator read is amortized over K right-hand sides ---
    note("config1: batched multi-RHS cycle...")
    K = 8
    try:
        # batched workloads build with lane_align=True (round 4): the
        # tile-aligned padded grid makes the batched strided grid ops
        # ~4x faster at ~12% more padded rows — measured per-RHS
        # V-cycle 2.87 -> 1.94 ms at 4.2M
        dsa_al = device_sa_setup(A_dia, grid=grid, dtype=jnp.float32,
                                 max_coarse=400, lane_align=True)
        h_al = dsa_al.hierarchy
        one_cycle_al = _make_cycle(len(h_al.levels), "V")
        one_cycle_b = jax.vmap(lambda o, v: one_cycle_al.zero(o, v),
                               in_axes=(None, 0))
        bK = jnp.asarray(np.random.default_rng(7).random(
            (K, h_al.levels[0].n_pad)), dtype=jnp.float32)
        t_cycle_K = net(_chained_time(jax, jnp, one_cycle_b, h_al, bK,
                                      k=32), 32)
        t_cycle_al = net(_chained_time(
            jax, jnp, lambda o, v: one_cycle_al.zero(o, v), h_al,
            bK[0], k=64), 64)
        batched = {
            "K": K,
            "lane_align": True,
            "t_vcycle_per_rhs_ms": round(t_cycle_K / K * 1e3, 3),
            "amortization_vs_single": round(
                t_cycle_al * K / t_cycle_K, 2),
            "work_gnnz_s": round(cycle_nnz * K / t_cycle_K / 1e9, 4),
        }
        # INTERLEAVED (S, K, 128) fast path (round 5,
        # engine/batched_cycle.py): finest level on contiguous
        # lane-chunk tiles, measured at the copy ceiling
        from pyamg_tpu.engine.batched_cycle import (
            interleaved_zero_vcycle, supports_interleaved)
        from pyamg_tpu.sparse.interleaved import to_interleaved
        if supports_interleaved(h_al):
            BiK = to_interleaved(bK)
            t_int = net(_chained_time(jax, jnp, interleaved_zero_vcycle,
                                      h_al, BiK, k=32), 32)
            batched["t_vcycle_per_rhs_interleaved_ms"] = round(
                t_int / K * 1e3, 3)
            batched["amortization_interleaved"] = round(
                t_cycle_al * K / t_int, 2)
            batched["work_gnnz_s"] = round(
                cycle_nnz * K / min(t_cycle_K, t_int) / 1e9, 4)
            # end-to-end batched solve through the public API (the
            # solve() router takes the interleaved CG path here); sync
            # rule: the pull must depend on EVERY program output
            # (CLAUDE.md round-5 timing note), which solve()'s
            # history materialization satisfies
            # stage the RHS stack on device first — a per-call host
            # upload of ~134 MB through the relay would dominate
            bK_cols = jnp.asarray(np.random.default_rng(7).random(
                (A.shape[0], K)), dtype=jnp.float32)
            float(jnp.sum(jnp.abs(bK_cols)))
            resK = []
            dsa_al.solve(bK_cols, tol=1e-5, maxiter=40, accel="cg",
                         residuals=resK, device_out=True)
            t0 = time.perf_counter()
            resK = []
            xb = dsa_al.solve(bK_cols, tol=1e-5, maxiter=40,
                              accel="cg", residuals=resK,
                              device_out=True)
            jax.block_until_ready(xb)
            batched["solve_to_1e5_per_rhs_s"] = round(
                (time.perf_counter() - t0) / K, 4)
            batched["solve_iters"] = max(len(r) - 1 for r in resK)
    except Exception as e:   # a kernel-compile failure must not kill the
        batched = {"error": f"{type(e).__name__}: {e}"[:200]}  # contract

    detail["config1"] = {
        "problem": "2D 5-pt Poisson %dx%d, SA V-cycle + CG, Jacobi" % grid,
        "n": A.shape[0], "nnz_finest": int(A.nnz),
        "cycle_nnz": cycle_nnz,
        # *_net_ms = chip time (raw chained time minus RTT/k per
        # CLAUDE.md's timing rule); *_raw_ms includes the amortized
        # dispatch roundtrip and matches rounds 1-4 for continuity.
        # All derived throughputs below use NET.
        "t_vcycle_ms": round(t_cycle_raw * 1e3, 3),
        "t_vcycle_net_ms": round(t_cycle * 1e3, 3),
        "vcycle_work_gnnz_s": round(vcycle_nnz_s / 1e9, 4),
        "spmv_net_ms": round(t_spmv * 1e3, 3),
        "spmv_gnnz_s": round(spmv_nnz_s / 1e9, 4),
        "triad_gbs": round(triad_gbs, 1),
        "spmv_gbs": round(spmv_gbs, 1),
        "spmv_frac_of_peak": round(spmv_frac_of_peak, 3),
        "host_vcycle_gnnz_s": round(host_nnz_s / 1e9, 4),
        "setup_host_s": round(t_host_setup, 2),
        "setup_device_s": round(t_dev_setup, 3),
        "setup_speedup": round(t_host_setup / t_dev_setup, 1),
        "device_setup_cg_iters_to_1e-5": len(res_ds) - 1,
        # same work-metric basis (host hierarchy's cycle_nnz) for a fair
        # comparison of the two hierarchies' cycle times
        "t_vcycle_device_setup_ms": round(t_cycle_ds_raw * 1e3, 3),
        "t_vcycle_device_setup_net_ms": round(t_cycle_ds * 1e3, 3),
        "vcycle_device_setup_work_gnnz_s": round(
            cycle_nnz / t_cycle_ds / 1e9, 4),
        "batched_rhs": batched,
    }

    # ================= config 2: 3D Poisson 64^3, SA + sym GS, W ========
    note("config2: 64^3 setup...")
    A2 = poisson((64, 64, 64), format="csr")
    ml2 = pyamg_tpu.smoothed_aggregation_solver(
        A2, presmoother=("gauss_seidel", {"sweep": "symmetric"}),
        postsmoother=("gauss_seidel", {"sweep": "symmetric"}))
    dml2 = DeviceMultilevelSolver(compile_hierarchy(ml2, dtype=jnp.float32,
                                                  coarse_cutoff=1024))
    b2 = np.random.default_rng(1).random(A2.shape[0])
    one_cycle2 = _make_cycle(len(dml2.hierarchy.levels), "W")
    h2 = dml2.hierarchy
    n2_pad = dml2.hierarchy.levels[0].n_pad
    b2p = jnp.asarray(np.pad(b2, (0, n2_pad - len(b2))), dtype=jnp.float32)
    # k=64: at ~25-30 ms session RTT a k=16 chain leaves ~1.8 ms of
    # noise in the net subtraction — larger than the W-cycle itself on
    # the device-built hierarchy (round 5)
    t_w_raw = _chained_time(
        jax, jnp, lambda o, v: one_cycle2(o, jnp.zeros_like(v), v), h2,
        b2p, k=64)
    t_w = net(t_w_raw, 64)
    # 3-D device setup (structured stride-3 pipeline, one XLA program)
    note("config2: 3D device setup path...")
    t0 = time.perf_counter()
    dsa2 = device_sa_setup(A2, grid=(64, 64, 64), dtype=jnp.float32,
                           max_coarse=400)
    float(dsa2.hierarchy.coarse_inv[0, 0])
    t0 = time.perf_counter()
    dsa2 = device_sa_setup(A2, grid=(64, 64, 64), dtype=jnp.float32,
                           max_coarse=400)
    float(dsa2.hierarchy.coarse_inv[0, 0])
    t_dev_setup2 = time.perf_counter() - t0
    res_ds2 = []
    dsa2.solve(b2, tol=1e-5, maxiter=40, accel="cg", residuals=res_ds2)

    # device-built W-cycle: rolled structured transfers avoid the 3-D
    # windowed one-hot tax (a 3-D transfer window spans 3 grid planes)
    one_w_ds = _make_cycle(len(dsa2.hierarchy.levels), "W")
    h2ds = dsa2.hierarchy
    b2ds = jnp.ones(h2ds.levels[0].n_pad, dtype=jnp.float32)
    t_w_ds_raw = _chained_time(
        jax, jnp, lambda o, v: one_w_ds(o, jnp.zeros_like(v), v), h2ds,
        b2ds, k=64)
    t_w_ds = net(t_w_ds_raw, 64)

    detail["config2"] = {
        "problem": "3D 7-pt Poisson 64^3, SA + symmetric GS (multicolor), "
                   "W-cycle",
        "n": A2.shape[0], "nnz_finest": int(A2.nnz),
        "t_wcycle_ms": round(t_w_raw * 1e3, 3),
        "t_wcycle_net_ms": round(t_w * 1e3, 3),
        "wcycle_work_gnnz_s": round(_cycle_nnz(ml2) / t_w / 1e9, 4),
        "t_wcycle_device_setup_ms": round(t_w_ds_raw * 1e3, 3),
        "t_wcycle_device_setup_net_ms": round(t_w_ds * 1e3, 3),
        "setup_device_s": round(t_dev_setup2, 3),
        "device_setup_cg_iters_to_1e-5": len(res_ds2) - 1,
    }
    _mixed.append(("config2", ml2, b2, dict(tol=1e-8, maxiter=30,
                                            cycle="W", accel=None)))

    # ===== config 3: rotated anisotropic diffusion 512^2, RS + GMRES ====
    note("config3: RS setup...")
    S3 = diffusion_stencil_2d(epsilon=1e-3, theta=0.0, type="FD")
    A3 = stencil_grid(S3, (512, 512)).tocsr()
    ml3 = pyamg_tpu.ruge_stuben_solver(A3)
    b3 = np.random.default_rng(2).random(A3.shape[0])
    # device setup with stride='auto' SEMICOARSENING (per-dim strides
    # from the stencil's coupling anisotropy; engine/device_setup.py)
    note("config3: semicoarsening device setup path...")
    dsa3 = device_sa_setup(A3, grid=(512, 512), dtype=jnp.float32,
                           max_coarse=400, stride="auto")
    float(dsa3.hierarchy.coarse_inv[0, 0])
    t0 = time.perf_counter()
    dsa3 = device_sa_setup(A3, grid=(512, 512), dtype=jnp.float32,
                           max_coarse=400, stride="auto")
    float(dsa3.hierarchy.coarse_inv[0, 0])
    t_dev_setup3 = time.perf_counter() - t0
    res_ds3 = []
    dsa3.solve(b3, tol=1e-5, maxiter=60, accel="cg", residuals=res_ds3)

    # device CLASSICAL setup (round-2 cont., engine/classical_setup.py):
    # multi-pass direct interpolation RS hierarchy built on device
    note("config3: classical device setup path...")
    from pyamg_tpu.engine import device_rs_setup
    try:
        drs3 = device_rs_setup(A3, grid=(512, 512), dtype=jnp.float32,
                               max_coarse=400)
        float(drs3.hierarchy.coarse_inv[0, 0])
        t0 = time.perf_counter()
        drs3 = device_rs_setup(A3, grid=(512, 512), dtype=jnp.float32,
                               max_coarse=400)
        float(drs3.hierarchy.coarse_inv[0, 0])
        t_rs_setup3 = time.perf_counter() - t0
        res_rs3 = []
        drs3.solve(b3, tol=1e-5, maxiter=60, accel="cg",
                   residuals=res_rs3)
    except Exception as e:
        t_rs_setup3 = None
        res_rs3 = [1.0]
        note(f"classical device setup failed: {e}")

    detail["config3"] = {
        "problem": "rotated anisotropic diffusion 512^2 (eps=1e-3), "
                   "classical RS + GMRES",
        "n": A3.shape[0], "nnz_finest": int(A3.nnz),
        "levels": len(ml3.levels),
        "setup_device_s": round(t_dev_setup3, 3),
        "device_setup_strides": [
            list(i["strides"]) for i in dsa3.setup_info["levels"]],
        "device_setup_cg_iters_to_1e-5": len(res_ds3) - 1,
        "classical_device_setup_s": (
            round(t_rs_setup3, 3) if t_rs_setup3 is not None else None),
        "classical_device_cg_iters_to_1e-5": len(res_rs3) - 1,
    }
    _mixed.append(("config3", ml3, b3, dict(tol=1e-8, maxiter=60,
                                            accel="gmres")))

    # ========== config 4: 2D elasticity BSR bs=2, rootnode + CG =========
    note("config4: rootnode setup...")
    A4, B4 = linear_elasticity((128, 128))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ml4 = pyamg_tpu.rootnode_solver(A4, B=B4, strength="symmetric")
    b4 = np.random.default_rng(3).random(A4.shape[0])
    # block device setup (BSR bs=2 + 3 rigid-body candidates on device;
    # engine/block_setup.py) — elasticity needs the f64 outer Krylov, so
    # iters here use mixed precision below at phase B scale; the f32
    # setup wall time is the headline
    note("config4: block device setup path...")
    from pyamg_tpu.engine import device_sa_setup_block
    dsb = device_sa_setup_block(A4, grid=(128, 127), B=B4,
                                max_coarse=400)
    float(dsb.hierarchy.coarse_inv[0, 0])
    t0 = time.perf_counter()
    dsb = device_sa_setup_block(A4, grid=(128, 127), B=B4,
                                max_coarse=400)
    float(dsb.hierarchy.coarse_inv[0, 0])
    t_dev_setup4 = time.perf_counter() - t0

    detail["config4"] = {
        "problem": "2D linear elasticity 128^2 (BSR bs=2), rootnode SA "
                   "+ CG (block-DIA device format)",
        "n": A4.shape[0], "nnz_finest": int(A4.nnz),
        "setup_device_s": round(t_dev_setup4, 3),
    }
    _mixed.append(("config4", ml4, b4, dict(tol=1e-8, maxiter=60,
                                            accel="cg")))

    # === config 5: recirc advection-diffusion 1024^2, NSR + BiCGStab ====
    # CPU fallback shrinks to 512^2: the 1024^2 x64 mixed phase-B solve
    # exceeded 50 GB RSS on the CPU backend (OOM-killed a round-5
    # probe) and the driver must always get its JSON line
    g5_bench = (1024, 1024) if backend == "tpu" else (512, 512)
    note(f"config5: recirc {g5_bench[0]}^2 setup (the big host setup)...")
    A5 = recirc_flow(g5_bench, epsilon=1e-2)
    t0 = time.perf_counter()
    ml5 = pyamg_tpu.smoothed_aggregation_solver(
        A5, symmetry="nonsymmetric",
        # degree-1 energy smoothing (round 5): round 4's degree-2 switch
        # was tuned on 256^2/512^2 HOST solves (exact GS-NR smoothing)
        # but the bench's 1e-8 number is a DEVICE solve where GS-NR is
        # substituted by Cimmino — at 1024^2 the degree-2 oc-1.81
        # hierarchy under Cimmino smoothing regressed to conv 0.902 and
        # never reached 1e-8 (maxiter cap, final relres 3.3e-5).
        # Degree 1 reaches true 1e-8 (round 3: 49 BiCGStab iters,
        # 0.39 s); scripts/probe_config5.py holds the recipe scan.
        smooth=("energy", {"krylov": "gmres", "maxiter": 3, "degree": 1}),
        strength="symmetric",
        # nonsymmetric problems need NR candidate improvement — the
        # default (symmetric block-GS on A z = 0) diverges on strong
        # advection and the resulting hierarchy stalls at >=128^2
        improve_candidates=(("gauss_seidel_nr",
                             {"sweep": "symmetric", "iterations": 4}),
                            None),
        presmoother=("gauss_seidel_nr", {"sweep": "symmetric",
                                         "iterations": 2}),
        postsmoother=("gauss_seidel_nr", {"sweep": "symmetric",
                                          "iterations": 2}))
    t5_setup = time.perf_counter() - t0
    b5 = np.random.default_rng(4).random(A5.shape[0])
    detail["config5"] = {
        "problem": f"nonsym recirculating advection-diffusion "
                   f"{g5_bench[0]}^2, "
                   "energy-min NSR SA + BiCGStab (single chip; "
                   "row-partitioned path validated on the virtual "
                   "8-device mesh: tests/test_parallel.py, "
                   "test_baseline_configs.py::config5)",
        "n": A5.shape[0], "nnz_finest": int(A5.nnz),
        "setup_host_s": round(t5_setup, 1),
    }
    # device CLASSICAL setup on the nonsymmetric operator (round 3):
    # multi-pass direct-interpolation RS built on device handles the
    # recirculating-flow stencil (measured conv 0.70 vs the host
    # energy-min hierarchy's 0.645 — competitive at 11x less setup)
    note("config5: classical device setup path...")
    from pyamg_tpu.engine import device_rs_setup as _drs
    g5 = (int(np.sqrt(A5.shape[0])),) * 2     # recirc grids are square
    try:
        drs5 = _drs(A5, grid=g5, dtype=jnp.float32, max_coarse=400)
        float(drs5.hierarchy.coarse_inv[0, 0])
        t0 = time.perf_counter()
        drs5 = _drs(A5, grid=g5, dtype=jnp.float32, max_coarse=400)
        float(drs5.hierarchy.coarse_inv[0, 0])
        detail["config5"]["device_setup_s"] = round(
            time.perf_counter() - t0, 3)
    except Exception as e:
        detail["config5"]["device_setup_error"] = (
            f"{type(e).__name__}: {e}"[:200])
    _mixed.append(("config5", ml5, b5, dict(tol=1e-8, maxiter=100,
                                            accel="bicgstab")))

    # ===== AIR: device nonsymmetric classical on upwind advection =======
    note("air: device AIR setup on advection 256^2...")
    from pyamg_tpu.engine import device_air_setup
    from pyamg_tpu.gallery import advection_2d
    try:
        Aair, bair = advection_2d((256, 256), theta=np.pi / 4)
        dair = device_air_setup(Aair, grid=(256, 256), max_coarse=400)
        float(dair.hierarchy.coarse_inv[0, 0])
        t0 = time.perf_counter()
        dair = device_air_setup(Aair, grid=(256, 256), max_coarse=400)
        float(dair.hierarchy.coarse_inv[0, 0])
        t_air_setup = time.perf_counter() - t0
        res_air = []
        dair.solve(bair, tol=1e-8, maxiter=5, residuals=res_air)
        detail["air"] = {
            "problem": "upwind advection 256^2 (theta=pi/4), device AIR "
                       "(one-point P + degree-2 local ideal restriction)",
            "setup_device_s": round(t_air_setup, 3),
            "first_cycle_residual_drop": (
                round(float(res_air[0]) / float(res_air[1]), 1)
                if len(res_air) > 1 and res_air[1] else None),
        }
    except Exception as e:
        detail["air"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ============ phase B: x64 mixed-precision time-to-1e-8 =============
    # (f32 V-cycle preconditioner + f64 outer Krylov, fully on device —
    # pure-f32 Krylov stagnates at the ~1e-6 f32 residual floor, so every
    # config's 1e-8 number runs mixed)
    # Release phase-A executables first: on the CPU backend every jitted
    # program keeps JIT code pages mapped, and the accumulated map count
    # exceeds vm.max_map_count (65530) mid-phase-B — mmap then fails
    # with ENOMEM despite >100 GB free and LLVM segfaults (observed:
    # rc=139 at "config4 mixed"). Phase A results are already recorded;
    # nothing below reuses its compilations.
    note("phase B: mixed-precision (enables x64)...")
    jax.clear_caches()
    dml_mixed = DeviceMultilevelSolver(
        compile_hierarchy(ml, dtype=jnp.float32, mixed_precision=True,
                          coarse_cutoff=1024))
    bb = np.random.default_rng(1).random(A.shape[0])
    t1e8, res8, _ = _timed_device_solve(dml_mixed, bb, tol=1e-8,
                                        maxiter=100, accel="cg",
                                        precision="mixed")
    detail["config1"].update(_solve_fields(t1e8, res8, rtt=rtt))

    # config4 block DEVICE-setup mixed solve (the on-device-built
    # hierarchy solving to true 1e-8; cf. setup_device_s above)
    # config1 DEVICE-setup mixed solve: the flagship fully-TPU-native
    # end-to-end number — hierarchy built on device (0.17 s) AND solved
    # to TRUE 1e-8 on device (f64 outer Krylov, f32 cycle)
    note("phase B: config1 device-setup mixed solve...")
    try:
        dsa_m = device_sa_setup(A, grid=grid, dtype=jnp.float32,
                                max_coarse=400, mixed_precision=True)
        t1m, res1m, _ = _timed_device_solve(
            dsa_m, b_h[: A.shape[0]], tol=1e-8, maxiter=100,
            accel="cg", precision="mixed")
        detail["config1"].update(
            _solve_fields(t1m, res1m, prefix="device_setup_", rtt=rtt))
    except Exception as e:   # must never break the driver contract
        detail["config1"]["device_setup_mixed_error"] = (
            f"{type(e).__name__}: {e}"[:200])

    # config2 DEVICE-setup mixed solve (CG-accelerated W: the
    # jacobi-smoothed structured cycle is weaker standalone than the
    # host multicolor-GS one, but Krylov-wrapped it reaches true 1e-8
    # in a fraction of the host-built time — 1.9 vs 15.8 ms/W-cycle)
    note("phase B: config2 device-setup mixed solve...")
    try:
        dsa2_m = device_sa_setup(A2, grid=(64, 64, 64),
                                 dtype=jnp.float32, max_coarse=400,
                                 mixed_precision=True)
        t2m, res2m, _ = _timed_device_solve(dsa2_m, b2, tol=1e-8,
                                            maxiter=40, cycle="W",
                                            accel="cg",
                                            precision="mixed")
        detail["config2"].update(
            _solve_fields(t2m, res2m, prefix="device_setup_", rtt=rtt))
    except Exception as e:
        detail["config2"]["device_setup_mixed_error"] = (
            f"{type(e).__name__}: {e}"[:200])

    note("phase B: config5 classical device-setup mixed solve...")
    try:
        drs5m = _drs(A5, grid=g5, dtype=jnp.float32, max_coarse=400,
                     mixed_precision=True)
        t5m, res5m, _ = _timed_device_solve(drs5m, b5, tol=1e-8,
                                            maxiter=150, accel="fgmres",
                                            precision="mixed")
        detail["config5"].update(
            _solve_fields(t5m, res5m, prefix="device_setup_", rtt=rtt))
    except Exception as e:
        detail["config5"]["device_setup_mixed_error"] = (
            f"{type(e).__name__}: {e}"[:200])

    note("phase B: config4 block device-setup mixed solve...")
    dsb_m = device_sa_setup_block(A4, grid=(128, 127), B=B4,
                                  max_coarse=400, mixed_precision=True)
    t4m, res4m, _ = _timed_device_solve(dsb_m, b4, tol=1e-8, maxiter=100,
                                        accel="cg", precision="mixed")
    detail["config4"].update(
        _solve_fields(t4m, res4m, prefix="device_setup_", rtt=rtt))

    for name, mlx, bx, kw in _mixed:
        note(f"phase B: {name} mixed solve...")
        jax.clear_caches()          # see phase-B map-count note above
        dmx = DeviceMultilevelSolver(
            compile_hierarchy(mlx, dtype=jnp.float32,
                              mixed_precision=True, coarse_cutoff=1024))
        tX, resX, _ = _timed_device_solve(dmx, bx, precision="mixed",
                                          **kw)
        detail[name].update(_solve_fields(tX, resX, tol=kw["tol"],
                                  rtt=rtt))
        detail[name]["conv_factor"] = round(_factor(resX) or 0, 4)

    detail["dispatch_rtt_ms"] = round(rtt * 1e3, 3)
    detail["scaling"] = {
        "chips": jax.device_count(),
        "note": "single-chip environment; multi-chip row partitioning "
                "validated functionally on a virtual 8-device mesh "
                "(tests/test_parallel.py, dryrun_multichip); real-slice "
                "nnz/s scaling requires hardware not exposed here",
    }

    # Full detail goes to a sidecar file: the driver captures only the
    # LAST ~2000 chars of stdout, and round 2's inline 5-config detail
    # (~4.5 kB) truncated the JSON line mid-object -> "parsed": null in
    # BENCH_r02.json.  The printed line stays compact (<1.5 kB) with a
    # per-config summary; bench_detail.json holds everything.
    try:
        with open("bench_detail.json", "w") as f:
            json.dump(detail, f, default=float, indent=1)
        detail_ref = "bench_detail.json"
    except OSError:
        detail_ref = None

    def _pick(cfg, keys):
        src = detail.get(cfg, {})
        out = {}
        for short, full in keys:
            v = src.get(full)
            if v is not None:
                out[short] = v
        return out

    # summary times are NET of dispatch RTT (*_net_ms keys); the
    # ("unconv_s", ...) picks only materialize when a solve FAILED to
    # reach tolerance, so an unconverged run is visible even in the
    # compact driver line.
    summary = {
        "config1": _pick("config1", [
            ("t_vcycle_ms", "t_vcycle_net_ms"),
            ("t_vcycle_ds_ms", "t_vcycle_device_setup_net_ms"),
            ("spmv_gnnz_s", "spmv_gnnz_s"),
            ("setup_dev_s", "setup_device_s"),
            ("t_1e8_s", "time_to_1e8_s"), ("it_1e8", "iters_to_1e8"),
            ("unconv_s", "time_unconverged_s"),
            ("dev_t_1e8_s", "device_setup_time_to_1e8_s"),
            ("dev_unconv_s", "device_setup_time_unconverged_s")]),
        "config2": _pick("config2", [
            ("t_wcycle_ms", "t_wcycle_net_ms"),
            ("t_wcycle_ds_ms", "t_wcycle_device_setup_net_ms"),
            ("setup_dev_s", "setup_device_s"),
            ("t_1e8_s", "time_to_1e8_s"), ("conv", "conv_factor"),
            ("unconv_s", "time_unconverged_s"),
            ("dev_t_1e8_s", "device_setup_time_to_1e8_s"),
            ("dev_unconv_s", "device_setup_time_unconverged_s")]),
        "config3": _pick("config3", [
            ("setup_dev_s", "setup_device_s"),
            ("t_1e8_s", "time_to_1e8_s"), ("conv", "conv_factor"),
            ("unconv_s", "time_unconverged_s")]),
        "config4": _pick("config4", [
            ("setup_dev_s", "setup_device_s"),
            ("t_1e8_s", "time_to_1e8_s"),
            ("unconv_s", "time_unconverged_s"),
            ("dev_t_1e8_s", "device_setup_time_to_1e8_s"),
            ("dev_unconv_s", "device_setup_time_unconverged_s")]),
        "config5": _pick("config5", [
            ("setup_host_s", "setup_host_s"),
            ("setup_dev_s", "device_setup_s"),
            ("t_1e8_s", "time_to_1e8_s"), ("conv", "conv_factor"),
            ("unconv_s", "time_unconverged_s"),
            ("dev_t_1e8_s", "device_setup_time_to_1e8_s"),
            ("dev_unconv_s", "device_setup_time_unconverged_s")]),
        "air_setup_s": detail.get("air", {}).get("setup_device_s"),
    }

    # headline = the FASTEST SA V-cycle the framework offers on this
    # problem (round 3: the device-built hierarchy overtook the
    # host-built one); both paths' numbers stay in detail/summary, and
    # the work basis (host hierarchy cycle_nnz) is identical for both.
    ds_nnz_s = (cycle_nnz / t_cycle_ds) if t_cycle_ds else 0.0
    best_nnz_s = max(vcycle_nnz_s, ds_nnz_s)
    which = "device-built" if ds_nnz_s > vcycle_nnz_s else "host-built"
    # "work-normalized": both paths are credited with the SAME host-
    # hierarchy cycle_nnz basis (the two hierarchies do different work
    # per cycle and converge at different rates — this is an effective-
    # work number, not a per-path bandwidth; ADVICE r3)
    result = {
        "metric": "SA V-cycle work-normalized throughput (2D Poisson "
                  "%dx%d, f32, %s, %s hierarchy; host-hierarchy "
                  "cycle-nnz basis, net of dispatch RTT)"
                  % (grid[0], grid[1], backend, which),
        "value": round(best_nnz_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(best_nnz_s / host_nnz_s, 3),
        "detail_file": detail_ref,
        "summary": summary,
    }
    # default=float: any stray numpy scalar must never break the
    # driver's one-line JSON contract
    line = json.dumps(result, default=float)
    if len(line) > 1900:        # belt-and-braces: never exceed the
        result.pop("summary")   # driver's stdout tail capture
        line = json.dumps(result, default=float)
    print(line)


if __name__ == "__main__":
    grid = (2048, 2048)
    verbose = "-v" in sys.argv
    args = [a for a in sys.argv[1:] if a != "-v"]
    if args:
        g = int(args[0])
        grid = (g, g)
    main(grid, verbose=verbose)
