"""Device (jitted) classical Ruge-Stüben setup — TPU-native hierarchy
construction for the CLASSICAL AMG family on grid stencils.

The companion of :mod:`engine.device_setup` (SA) for the reference's
classical solver family (reference counterpart: [R]
pyamg/classical/classical.py::ruge_stuben_solver + split.py +
interpolate.py, SURVEY.md §2.2): strength-guided C/F coarsening, direct
interpolation from C neighbors, R = P^T, Galerkin RAP — all as ONE
jitted XLA program of rolls/reshapes/reduce-windows (zero gathers, zero
host round-trips; DESIGN.md rule 1).

TPU-first re-design, not a port.  The reference's serial two-pass RS
splitting and per-row interpolation loops become, on a regular grid:

- **C/F splitting**: C-points are the stride-2 sublattice of the
  COARSENED dims (per-dim strides support SEMICOARSENING: a weakly
  coupled dim keeps stride 1 — the structured analog of only splitting
  along strong connections, [R] pyamg/classical/split.py semantics on a
  grid-aligned strength graph).  ``stride='auto'`` reads per-dim
  coupling strengths off the stencil exactly like ``device_sa_setup``.
- **multi-pass direct interpolation**: F-points with m off-sublattice
  coords interpolate in pass m from points with fewer (pass 1 = the
  reference's direct interpolation from C neighbors; later passes are
  the structured form of distance-two/standard interpolation, [R]
  pyamg/classical/interpolate.py::distance_two_interpolation — an
  (odd,odd) point on a 5-point stencil has NO C neighbor, the classic
  reason the reference grows interpolation through F-F connections).
  Each pass is an EMBEDDED fine-grid DIA operator S_m (identity on
  finished rows, interpolation weights on pass-m rows); the prolongator
  is the product P = S_dim · … · S_1 · D_C via `dia_spgemm` — pure
  rolls + FMAs.  Weights follow rs_direct_interpolation_pass2's
  positive/negative split: alpha = Σ_all a^- / Σ_targets a^-,
  beta = Σ_all a^+ / Σ_targets a^+ (positives lumped into the diagonal
  when no positive target exists), w_ij = -(alpha|beta)·a_ij / a_ii.
- **Galerkin RAP**: R = P^T by diagonal rolls; R·(A·P) through the
  static center-offset filter + strided compaction shared with the SA
  path.  The coarse stencil stays ≤ 3^d points at every level (P spans
  ±1 fine cell per dim, so RAP spans ≤ ±3, and only even offsets
  survive compaction — deltas ∈ {0, ±2} fine = {0, ±1} coarse).

Scope: scalar stencil operators on rectangular grids (2-D/3-D), the
classical family's structured problems (BASELINE config 3).  Fully
unstructured classical AMG stays on the host path
(`ruge_stuben_solver` + `compile_hierarchy`), the parity reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax

from ..sparse import DIAMatrix, dia_from_scipy
from ..sparse.dia import DenseOperator, dia_spgemm
from . import relaxation as device_relaxation
from .device_setup import (StructuredDeviceSolver, _compact_dia,
                           _compact_fine, _coords_to_offset,
                           _dia_spgemm_filtered, _embed_coarse,
                           _grid_pad_vec, _grid_unpad_vec, _ns_pinv,
                           _offset_to_coords, _padded_grid, _power_rho,
                           _relayout_dia, _relayout_jit,
                           _smoother_device_arrays, _smoother_wrap,
                           _spec_key, _tup, dia_transpose)
from .hierarchy import DeviceHierarchy, DeviceLevel

__all__ = ["device_rs_setup", "EmbeddedProlongator", "EmbeddedRestrictor"]


# ---------------------------------------------------------------------------
# solve-phase transfer pytrees (materialized embedded P / R)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class EmbeddedProlongator:
    """P stored as an embedded fine-grid DIA (columns live on C-point
    positions): P @ xc = P_emb @ embed(xc).  ≤3^d diagonals, so the
    apply is a handful of rolls — same data movement as the reference's
    CSR P apply ([R] pyamg/multilevel.py __solve), gather-free."""

    P_emb: DIAMatrix
    fine_grid_p: Tuple[int, ...]
    coarse_grid: Tuple[int, ...]
    coarse_grid_p: Tuple[int, ...]
    stride: Tuple[int, ...]
    center: Tuple[int, ...]

    def tree_flatten(self):
        return (self.P_emb,), (self.fine_grid_p, self.coarse_grid,
                               self.coarse_grid_p, self.stride, self.center)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (P_emb,) = children
        f, c, cp, s, ctr = aux
        return cls(P_emb=P_emb, fine_grid_p=f, coarse_grid=c,
                   coarse_grid_p=cp, stride=s, center=ctr)

    @property
    def nnz(self):
        # structural estimate for complexity reporting: every fine row
        # holds at most ndiags interpolation entries
        return int(np.prod(self.fine_grid_p)) * self.P_emb.ndiags

    @property
    def shape(self):
        return (int(np.prod(self.fine_grid_p)),
                int(np.prod(self.coarse_grid_p)))

    def __matmul__(self, xc):
        xc = _grid_unpad_vec(xc, self.coarse_grid, self.coarse_grid_p)
        e = _embed_coarse(xc, self.coarse_grid, self.stride, self.center)
        return self.P_emb @ e


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class EmbeddedRestrictor:
    """R = P^T, applied as R_emb @ r then strided compaction at the
    C-point positions."""

    R_emb: DIAMatrix
    fine_grid_p: Tuple[int, ...]
    coarse_grid: Tuple[int, ...]
    coarse_grid_p: Tuple[int, ...]
    stride: Tuple[int, ...]
    center: Tuple[int, ...]

    def tree_flatten(self):
        return (self.R_emb,), (self.fine_grid_p, self.coarse_grid,
                               self.coarse_grid_p, self.stride, self.center)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (R_emb,) = children
        f, c, cp, s, ctr = aux
        return cls(R_emb=R_emb, fine_grid_p=f, coarse_grid=c,
                   coarse_grid_p=cp, stride=s, center=ctr)

    @property
    def nnz(self):
        return int(np.prod(self.fine_grid_p)) * self.R_emb.ndiags

    @property
    def shape(self):
        return (int(np.prod(self.coarse_grid_p)),
                int(np.prod(self.fine_grid_p)))

    @property
    def n_pad(self):
        return int(np.prod(self.coarse_grid_p))

    def __matmul__(self, r):
        y = self.R_emb @ r
        yc = _compact_fine(y, self.coarse_grid, self.stride, self.center)
        return _grid_pad_vec(yc, self.coarse_grid, self.coarse_grid_p)


# ---------------------------------------------------------------------------
# splitting + interpolation (traced)
# ---------------------------------------------------------------------------

def _oddness_masks(grid_p, stride, center):
    """Flat masks by pass class: mask[m] = points whose number of
    COARSENED dims with coord != center (mod stride) equals m.

    m = 0 is the C sublattice; m = 1..n_coarse_dims are the F passes
    (the structured C/F splitting — [R] pyamg/classical/split.py's
    F_NODE/C_NODE arrays become static-iota parity masks)."""
    dim = len(grid_p)
    ss = _tup(stride, dim)
    cc = _tup(center, dim)
    n_coarse_dims = sum(1 for s in ss if s > 1)
    oddness = jnp.zeros(grid_p, dtype=jnp.int32)
    for d in range(dim):
        if ss[d] == 1:
            continue
        od = (jnp.arange(grid_p[d]) % ss[d] != cc[d]).astype(jnp.int32)
        shape = [1] * dim
        shape[d] = grid_p[d]
        oddness = oddness + od.reshape(shape)
    flat = oddness.reshape(-1)
    return [(flat == m) for m in range(n_coarse_dims + 1)], n_coarse_dims


def _pass_interp(A_p: DIAMatrix, fmask, tmask, dtype):
    """One interpolation pass as an embedded DIA operator S.

    Pass-m rows (fmask) hold direct-interpolation weights toward target
    points (tmask: C and earlier-pass points); all other rows are
    identity.  Weight formula = rs_direct_interpolation_pass2 ([R]
    pyamg/amg_core/ruge_stuben.h, SURVEY.md §2.4) with 'targets' in
    place of 'strong C neighbors':

        alpha_i = Σ_{j≠i} a_ij^-  /  Σ_{j targets} a_ij^-
        beta_i  = Σ_{j≠i} a_ij^+  /  Σ_{j targets} a_ij^+
        w_ij = -(alpha_i | beta_i) · a_ij / ã_ii,

    positives lumped into the diagonal when no positive target exists
    (ã_ii = a_ii + Σ a^+); negatives likewise guarded (stencil rows
    always have a negative target in practice)."""
    diag = A_p.diagonal()
    neg_all = jnp.zeros_like(diag)
    pos_all = jnp.zeros_like(diag)
    neg_t = jnp.zeros_like(diag)
    pos_t = jnp.zeros_like(diag)
    t_ind = []
    for d, o in enumerate(A_p.offsets):
        if o == 0:
            t_ind.append(None)
            continue
        a = A_p.data[d]
        neg_all = neg_all + jnp.minimum(a, 0)
        pos_all = pos_all + jnp.maximum(a, 0)
        ind = jnp.roll(tmask, -o)          # entry (i, i+o) lands on target
        t_ind.append(ind)
        at = jnp.where(ind, a, 0)
        neg_t = neg_t + jnp.minimum(at, 0)
        pos_t = pos_t + jnp.maximum(at, 0)

    alpha = jnp.where(neg_t != 0,
                      neg_all / jnp.where(neg_t != 0, neg_t, 1), 0.0)
    beta = jnp.where(pos_t != 0,
                     pos_all / jnp.where(pos_t != 0, pos_t, 1), 0.0)
    # lump couplings with no usable target into the diagonal
    diag_eff = (diag + jnp.where(pos_t == 0, pos_all, 0)
                + jnp.where(neg_t == 0, neg_all, 0))
    diag_eff = jnp.where(diag_eff != 0, diag_eff, 1.0)

    rows = []
    offsets = []
    for d, o in enumerate(A_p.offsets):
        if o == 0:
            continue
        a = A_p.data[d]
        scale = jnp.where(a < 0, alpha, beta)
        w = jnp.where(fmask & t_ind[d], -(scale * a) / diag_eff, 0.0)
        offsets.append(o)
        rows.append(w.astype(dtype))
    # identity on non-pass rows, zero diagonal on pass rows
    offsets.append(0)
    rows.append(jnp.where(fmask, 0.0, 1.0).astype(dtype))
    order = np.argsort(offsets)
    n = A_p.n_pad
    return DIAMatrix(data=jnp.stack([rows[i] for i in order]),
                     offsets=tuple(int(offsets[i]) for i in order),
                     shape=(n, n), nnz=n * len(offsets))


def _span_filter(A: DIAMatrix, B: DIAMatrix, grid_p, bound):
    """Offset-sum candidates of A·B whose per-dim delta magnitude stays
    within ``bound`` (per-dim).  dia_spgemm keeps every STRUCTURAL offset
    sum; without pruning, structurally-zero diagonals (parity-forbidden
    interpolation paths) inflate the span and compound per level — the
    offset count explodes and compile time with it (measured: 32² hung).
    The parity argument (module docstring): with per-dim stencil span
    a_d, interpolation moves each dim at most once by ≤ a_d, so
    |delta_d| ≤ a_d exactly for a_d = 1 stencils (conservative for
    wider — multi-hop distance-3 paths are dropped; document)."""
    cand = set()
    for oa in A.offsets:
        for ob in B.offsets:
            oc = oa + ob
            try:
                coords = _offset_to_coords(oc, grid_p)
            except ValueError:
                continue
            if all(abs(c) <= b for c, b in zip(coords, bound)):
                cand.add(oc)
    return cand


def _rs_coarsen_level(A_p: DIAMatrix, grid_p, stride, center, dtype):
    """One device classical coarsening step: masks → multi-pass P →
    R = P^T → filtered Galerkin RAP → compaction."""
    masks, n_passes = _oddness_masks(grid_p, stride, center)
    cmask = masks[0]
    ss = _tup(stride, len(grid_p))
    # per-dim span of the fine stencil (bounds every interpolation move)
    a_span = [0] * len(grid_p)
    for o in A_p.offsets:
        for d, c in enumerate(_offset_to_coords(o, grid_p)):
            a_span[d] = max(a_span[d], abs(c))
    p_bound = tuple(a if s > 1 else 0 for a, s in zip(a_span, ss))
    # P = S_n · … · S_1 · D_C  (D_C = injection at the C sublattice)
    n = A_p.n_pad
    P_emb = DIAMatrix(
        data=jnp.where(cmask, 1.0, 0.0).astype(dtype)[None, :],
        offsets=(0,), shape=(n, n), nnz=n)
    tmask = cmask
    for m in range(1, n_passes + 1):
        S_m = _pass_interp(A_p, masks[m], tmask, dtype)
        P_emb = _dia_spgemm_filtered(
            S_m, P_emb, _span_filter(S_m, P_emb, grid_p, p_bound))
        tmask = tmask | masks[m]
    R_emb = dia_transpose(P_emb)
    rap_bound = tuple(max(s, a) for s, a in zip(ss, a_span))
    AP = _dia_spgemm_filtered(
        A_p, P_emb, _span_filter(A_p, P_emb, grid_p, rap_bound))
    cand = set()
    for oa in R_emb.offsets:
        for ob in AP.offsets:
            oc = oa + ob
            try:
                coords = _offset_to_coords(oc, grid_p)
            except ValueError:
                continue
            if all(c % s == 0 and abs(c) <= b
                   for c, s, b in zip(coords, ss, rap_bound)):
                cand.add(oc)
    Ac_emb = _dia_spgemm_filtered(R_emb, AP, cand)
    A_c = _compact_dia(Ac_emb, grid_p, stride, center)
    return P_emb, R_emb, A_c


@partial(jax.jit, static_argnames=("plan", "dtype", "pre_key", "post_key"))
def _rs_setup_pipeline(A_in, *, plan, dtype, pre_key, post_key):
    """The ENTIRE multi-level classical setup as ONE XLA program (same
    program-count rationale as device_setup._setup_pipeline: through the
    axon relay, executable count — not FLOPs — dominates cold setup)."""
    cur = A_in
    out_levels = []
    for (grid, grid_p, strides) in plan:
        center = tuple(0 for _ in strides)
        A_p = _relayout_dia(cur, grid, grid_p)
        P_emb, R_emb, A_c = _rs_coarsen_level(A_p, grid_p, strides,
                                              center, dtype)
        diag = A_p.diagonal()
        dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1), 0)
        rho = _power_rho(A_p, dinv)
        pre_arr = _smoother_device_arrays(pre_key, A_p, dinv, rho, dtype)
        post_arr = _smoother_device_arrays(post_key, A_p, dinv, rho, dtype)
        out_levels.append((A_p, P_emb, R_emb, rho, pre_arr, post_arr))
        cur = A_c
    Ac_dense = cur @ jnp.eye(cur.n_pad, dtype=dtype)
    coarse_inv = _ns_pinv(Ac_dense)
    return tuple(out_levels), Ac_dense, coarse_inv


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def device_rs_setup(A, grid, dtype=jnp.float32, stride="auto",
                    max_coarse=400, max_levels=12,
                    presmoother=("jacobi", {"omega": 4.0 / 3.0}),
                    postsmoother=("jacobi", {"omega": 4.0 / 3.0}),
                    mixed_precision=False):
    """Build a classical (Ruge-Stüben) hierarchy ON DEVICE for a
    grid-stencil operator.

    The device companion of ``ruge_stuben_solver`` ([R]
    pyamg/classical/classical.py, SURVEY.md §2.2) for structured
    problems: C/F splitting = stride-2 sublattice of the strongly
    coupled dims, interpolation = multi-pass direct interpolation (see
    module docstring), R = P^T, Galerkin coarse operators, smoothers
    from on-device spectral-radius estimates.

    ``stride`` is 2, a per-dim tuple of 1/2 (semicoarsening), or
    ``'auto'`` (default): per-dim coupling read off the stencil, dims
    within 4x of the strongest coarsen (couplings rescale by 1/s² per
    level — the 1/h² law).  On grid-aligned anisotropy this reproduces
    the reference's strength-guided one-dimensional splitting.

    Smoothers: 'jacobi' / 'richardson' / 'chebyshev' specs — the device
    substitution for the reference's Gauss-Seidel default (DESIGN.md:
    multicolor GS belongs to the host-compiled path; the fused-Jacobi /
    Chebyshev forms are the TPU-native smoothers here).

    Returns a :class:`StructuredDeviceSolver`.
    """
    if jnp.dtype(dtype).itemsize == 8:
        jax.config.update("jax_enable_x64", True)
    grid = tuple(int(g) for g in grid)
    dim = len(grid)
    n = int(np.prod(grid))
    if sp.issparse(A) or isinstance(A, np.ndarray):
        if A.shape[0] != n:
            raise ValueError(f"grid {grid} does not match A {A.shape}")
        A_dia = dia_from_scipy(sp.csr_matrix(A), dtype=dtype, row_pad=1)
    elif isinstance(A, DIAMatrix):
        A_dia = A
    else:
        raise TypeError("A must be scipy sparse or DIAMatrix")

    couple = None
    if stride == "auto":
        couple = []
        offs = dict(zip(A_dia.offsets, range(len(A_dia.offsets))))
        for d in range(dim):
            delta = int(np.prod(grid[d + 1:]))
            s_d = 0.0
            for o in (delta, -delta):
                if o in offs:
                    s_d = max(s_d, float(jnp.mean(jnp.abs(
                        A_dia.data[offs[o]]))))
            couple.append(s_d)
        if max(couple) == 0:
            couple = None

    def _level_strides(cpl):
        if cpl is None:
            return _tup(2 if stride == "auto" else stride, dim)
        smax = max(cpl)
        return tuple(2 if c * 4.0 >= smax else 1 for c in cpl)

    plan = []
    cur_grid = grid
    cur_couple = couple
    while int(np.prod(cur_grid)) > max_coarse and len(plan) < max_levels - 1:
        strides = _level_strides(cur_couple)
        grid_p = _padded_grid(cur_grid, strides)
        if not all(gp >= 3 * s for gp, s in zip(grid_p, strides) if s > 1):
            break
        plan.append((cur_grid, grid_p, strides))
        cur_grid = tuple(g // s for g, s in zip(grid_p, strides))
        if cur_couple is not None:
            cur_couple = [c / (s * s) for c, s in zip(cur_couple, strides)]
    if not plan:
        raise ValueError(
            f"grid {grid} is below the coarsening threshold "
            f"(max_coarse={max_coarse}); use the host setup path")
    nlev = len(plan)

    pre_key = _spec_key(presmoother)
    post_key = _spec_key(postsmoother)

    out_levels, Ac_dense, coarse_inv = _rs_setup_pipeline(
        A_dia, plan=tuple(plan), dtype=dtype, pre_key=pre_key,
        post_key=post_key)

    dev_levels = []
    infos = []
    for i, ((lv_grid, grid_p, strides),
            (A_p, P_emb, R_emb, rho, pre_arr, post_arr)) in enumerate(
                zip(plan, out_levels)):
        centers = tuple(0 for _ in strides)
        coarse_grid = tuple(g // s for g, s in zip(grid_p, strides))
        coarse_grid_p = (plan[i + 1][1] if i + 1 < nlev else coarse_grid)
        P = EmbeddedProlongator(
            P_emb=P_emb, fine_grid_p=grid_p, coarse_grid=coarse_grid,
            coarse_grid_p=coarse_grid_p, stride=strides, center=centers)
        R = EmbeddedRestrictor(
            R_emb=R_emb, fine_grid_p=grid_p, coarse_grid=coarse_grid,
            coarse_grid_p=coarse_grid_p, stride=strides, center=centers)
        pre = _smoother_wrap(pre_key, pre_arr)
        post = _smoother_wrap(post_key, post_arr)
        npad_lvl = int(np.prod(grid_p))
        dev_levels.append(DeviceLevel(
            A=A_p, P=P, R=R, pre=pre, post=post, n=npad_lvl,
            n_pad=npad_lvl))
        infos.append({"level": i, "n": npad_lvl, "strides": strides,
                      "ndiags": A_p.ndiags, "rho_D_inv_A": rho})

    nc = int(np.prod(cur_grid))
    ident = device_relaxation.identity()
    Ac_op = DenseOperator(data=Ac_dense, shape=(nc, nc), nnz=nc * nc)
    dev_levels.append(DeviceLevel(A=Ac_op, P=None, R=None, pre=ident,
                                  post=ident, n=nc, n_pad=nc))

    A64 = None
    if mixed_precision:
        jax.config.update("jax_enable_x64", True)
        A64_dia = dia_from_scipy(sp.csr_matrix(A), dtype=jnp.float64,
                                 row_pad=1)
        A64 = _relayout_jit(A64_dia, grid=grid, grid_p=plan[0][1])

    hier = DeviceHierarchy(levels=dev_levels, coarse_inv=coarse_inv,
                           nc=nc, nc_pad=nc, dtype=dtype, A64=A64)
    return StructuredDeviceSolver(
        hier, grid, plan[0][1],
        setup_info={"levels": infos, "nlevels": nlev + 1,
                    "family": "classical"})
