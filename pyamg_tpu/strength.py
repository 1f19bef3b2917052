"""Strength-of-connection measures (setup phase, host side).

TPU-native rebuild of [R] pyamg/strength.py (SURVEY.md §2.3).  All measures
are implemented as vectorized NumPy/SciPy passes over CSR rows — the direct
analog of the rowwise amg_core kernels (classical_strength_of_connection_abs
/ _min, symmetric_strength_of_connection, maximum_row_value; SURVEY.md §2.4
ruge_stuben.h) with no per-element Python loops.

Every measure returns a CSR matrix S with the *same shape* as A whose
pattern marks strong connections; data holds the (positive) strength
measure, row-scaled so each row's largest entry is 1 (reference
convention).  Diagonal entries are kept (value 1 after scaling) —
downstream splitting/aggregation ignore self-loops explicitly.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .util.utils import blocksize, scale_rows_by_largest_entry
from .util.linalg import approximate_spectral_radius

__all__ = [
    "classical_strength_of_connection",
    "symmetric_strength_of_connection",
    "evolution_strength_of_connection",
    "energy_based_strength_of_connection",
    "distance_strength_of_connection",
    "algebraic_distance",
    "affinity_distance",
    "relaxation_vectors",
]


def _block_amalgamate(A, norm="fro"):
    """Collapse a BSR matrix to scalar CSR of block norms."""
    A = A.tobsr() if A.format != "bsr" else A
    bs_r, bs_c = A.blocksize
    n = A.shape[0] // bs_r
    m = A.shape[1] // bs_c
    if norm == "abs":
        vals = np.abs(A.data).max(axis=(1, 2))
    elif norm == "min":
        vals = A.data.min(axis=(1, 2))
    else:  # 'fro'
        vals = np.sqrt((np.abs(A.data) ** 2).sum(axis=(1, 2)))
    return sp.csr_matrix((vals, A.indices.copy(), A.indptr.copy()), shape=(n, m))


def _row_reduce(data, indptr, nrows, op, empty=0.0):
    """Per-row reduction over CSR data (vectorized via ufunc.reduceat)."""
    out = np.full(nrows, empty, dtype=data.dtype if data.size else np.float64)
    nz = np.diff(indptr) > 0
    if data.size:
        out[nz] = op.reduceat(data, indptr[:-1][nz])
    return out


def classical_strength_of_connection(A, theta=0.25, block=True, norm="abs"):
    """Classical Ruge-Stuben strength of connection.

    Rebuild of [R] pyamg/strength.py::classical_strength_of_connection
    (amg_core classical_strength_of_connection_abs/_min).

    norm='abs':  j strong for i  iff  |A_ij| >= theta * max_{k != i} |A_ik|
    norm='min':  j strong for i  iff  -A_ij  >= theta * max_{k != i} (-A_ik)
      (only negative couplings count — the AIR default, SURVEY.md §2.2).
    """
    if sp.issparse(A) and A.format == "bsr" and block:
        if A.blocksize == (1, 1):
            A = A.tocsr()
            S = classical_strength_of_connection(A, theta, block=False, norm=norm)
            return S
        Asc = _block_amalgamate(A, norm="fro" if norm == "fro" else "abs")
        return classical_strength_of_connection(Asc, theta, block=False, norm="abs")

    A = sp.csr_matrix(A)
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    offdiag = A.indices != rows

    if norm == "min":
        measure = np.where(offdiag, -np.real(A.data), 0.0)
        measure = np.maximum(measure, 0.0)
    else:
        measure = np.where(offdiag, np.abs(A.data), 0.0)

    rowmax = _row_reduce(measure, A.indptr, n, np.maximum)
    strong = (measure >= theta * rowmax[rows]) & (measure > 0) & offdiag
    keep = strong | ~offdiag  # keep diagonal
    data = np.where(offdiag, measure, 0.0)

    S = sp.csr_matrix(
        (data[keep], A.indices[keep], _recount_indptr(keep, A.indptr, n)),
        shape=A.shape,
    )
    # give diagonal entries weight so they survive row scaling as 1 later;
    # first scale off-diagonals, then set diagonal to the max (=1 post-scale)
    S = scale_rows_by_largest_entry(S)
    S = _set_diagonal_to(S, 1.0)
    return S


def _recount_indptr(keep, indptr, n):
    # reduceat only at nonempty rows: an empty trailing row would put
    # indptr[i] == len(keep) in the offset list, which reduceat rejects
    # (and empty mid-rows would alias the next row's first element).
    nz = np.diff(indptr) > 0
    counts = np.zeros(n, np.int64)
    if keep.size and nz.any():
        counts[nz] = np.add.reduceat(keep.astype(np.int64), indptr[:-1][nz])
    new_indptr = np.zeros(n + 1, dtype=indptr.dtype)
    np.cumsum(counts, out=new_indptr[1:])
    return new_indptr


def _set_diagonal_to(S, value):
    S = S.tocsr()
    d = S.diagonal()
    S = S + sp.dia_matrix(((value - d).reshape(1, -1), [0]), shape=S.shape)
    S = S.tocsr()
    S.sort_indices()
    return S


def symmetric_strength_of_connection(A, theta=0):
    """Symmetric strength: |A_ij| >= theta * sqrt(|A_ii| * |A_jj|).

    Rebuild of [R] pyamg/strength.py::symmetric_strength_of_connection
    (amg_core symmetric_strength_of_connection, SURVEY.md §2.4
    smoothed_aggregation.h).  theta=0 keeps the full pattern (the SA
    default).  BSR input is amalgamated by block Frobenius norm.
    """
    if theta < 0:
        raise ValueError("expected theta >= 0")
    if sp.issparse(A) and A.format == "bsr" and A.blocksize != (1, 1):
        Asc = _block_amalgamate(A, norm="fro")
        # block norms are all >= 0; diagonal blocks give the scaling
        return symmetric_strength_of_connection(Asc, theta)

    A = sp.csr_matrix(A)
    n = A.shape[0]
    if theta == 0:
        S = A.copy()
        S.data = np.abs(S.data)
        S = scale_rows_by_largest_entry(S)
        return _set_diagonal_to(S, 1.0)
    d = np.abs(A.diagonal())
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    offdiag = A.indices != rows
    thresh = theta * np.sqrt(d[rows] * d[A.indices])
    strong = (np.abs(A.data) >= thresh) & offdiag
    keep = strong | ~offdiag
    data = np.where(offdiag, np.abs(A.data), 0.0)
    S = sp.csr_matrix(
        (data[keep], A.indices[keep], _recount_indptr(keep, A.indptr, n)),
        shape=A.shape,
    )
    S = scale_rows_by_largest_entry(S)
    return _set_diagonal_to(S, 1.0)


def distance_strength_of_connection(A, V, theta=2.0, relative_drop=True):
    """Distance-based strength from vertex coordinates V.

    Rebuild of [R] pyamg/strength.py::distance_strength_of_connection.
    Connection (i, j) is strong when dist(i, j) <= theta (absolute) or
    dist(i, j) <= theta * min_k dist(i, k) (relative).  Returned measure is
    inverse distance, row-scaled to max 1.
    """
    A = sp.csr_matrix(A) if A.format != "bsr" else _block_amalgamate(A)
    V = np.asarray(V, dtype=np.float64)
    if V.shape[0] != A.shape[0]:
        raise ValueError("coordinate count must match matrix dimension")
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    cols = A.indices
    dist = np.sqrt(((V[rows] - V[cols]) ** 2).sum(axis=1))
    offdiag = rows != cols
    if relative_drop:
        big = np.where(offdiag, dist, np.inf)
        rowmin = _row_reduce(big, A.indptr, n, np.minimum, empty=np.inf)
        keep = offdiag & (dist <= theta * rowmin[rows])
    else:
        keep = offdiag & (dist <= theta)
    with np.errstate(divide="ignore"):
        inv = np.where(dist > 0, 1.0 / np.maximum(dist, 1e-300), 0.0)
    data = np.where(keep, inv, 0.0)
    keep_all = keep | ~offdiag
    S = sp.csr_matrix(
        (data[keep_all], cols[keep_all], _recount_indptr(keep_all, A.indptr, n)),
        shape=(n, n),
    )
    S = scale_rows_by_largest_entry(S)
    return _set_diagonal_to(S, 1.0)


def relaxation_vectors(A, R, k, alpha):
    """R test vectors relaxed k times with weighted Jacobi on A x = 0.

    Rebuild of [R] pyamg/strength.py::relaxation_vectors — the shared
    helper behind algebraic/affinity distance.
    """
    A = sp.csr_matrix(A)
    n = A.shape[0]
    rng = np.random.default_rng(7)
    x = rng.random((n, R)) - 0.5
    d = A.diagonal()
    with np.errstate(divide="ignore", invalid="ignore"):
        dinv = np.where(d != 0, 1.0 / d, 0.0)
    for _ in range(k):
        x = x - alpha * (dinv[:, None] * (A @ x))
    return x


def algebraic_distance(A, alpha=0.5, R=5, k=20, theta=0.1, p=2):
    """Algebraic-distance strength measure.

    Rebuild of [R] pyamg/strength.py::algebraic_distance:
    d_ij = (sum_r |x_r(i) - x_r(j)|^p)^(1/p) over relaxed test vectors;
    strength = 1/d, with entries dropped below theta * row max.
    """
    A = sp.csr_matrix(A) if A.format != "bsr" else _block_amalgamate(A)
    x = relaxation_vectors(A, R, k, alpha)
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    cols = A.indices
    diff = np.abs(x[rows] - x[cols])
    if p == np.inf:
        d = diff.max(axis=1)
    else:
        d = (diff ** p).sum(axis=1) ** (1.0 / p)
    return _drop_by_inverse_measure(A, rows, cols, d, theta)


def affinity_distance(A, alpha=0.5, R=5, k=20, theta=0.1):
    """Affinity-distance strength measure.

    Rebuild of [R] pyamg/strength.py::affinity_distance:
    affinity c_ij = |<x_i, x_j>|^2 / (<x_i, x_i> <x_j, x_j>); distance is
    1/c; entries dropped below theta * row max of the strength 1/d.
    """
    A = sp.csr_matrix(A) if A.format != "bsr" else _block_amalgamate(A)
    x = relaxation_vectors(A, R, k, alpha)
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    cols = A.indices
    num = (x[rows] * x[cols]).sum(axis=1) ** 2
    den = (x[rows] ** 2).sum(axis=1) * (x[cols] ** 2).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.where(den > 0, num / den, 0.0)
        d = np.where(c > 0, 1.0 / c, np.inf)
    return _drop_by_inverse_measure(A, rows, cols, d, theta)


def _drop_by_inverse_measure(A, rows, cols, d, theta):
    n = A.shape[0]
    offdiag = rows != cols
    with np.errstate(divide="ignore"):
        strength = np.where((d > 0) & np.isfinite(d), 1.0 / np.maximum(d, 1e-300), 0.0)
    strength = np.where(offdiag, strength, 0.0)
    rowmax = _row_reduce(strength, A.indptr, n, np.maximum)
    keep = offdiag & (strength >= theta * rowmax[rows]) & (strength > 0)
    keep_all = keep | ~offdiag
    data = np.where(keep, strength, 0.0)
    S = sp.csr_matrix(
        (data[keep_all], cols[keep_all], _recount_indptr(keep_all, A.indptr, n)),
        shape=(n, n),
    )
    S = scale_rows_by_largest_entry(S)
    return _set_diagonal_to(S, 1.0)


def evolution_strength_of_connection(
    A, B=None, epsilon=4.0, k=2, proj_type="l2", symmetrize_measure=True,
    weighting="diagonal",
):
    """Evolution (ODE-based) strength of connection.

    Rebuild of [R] pyamg/strength.py::evolution_strength_of_connection
    (Olson, Schroder, Tuminaro 2010).  Measures how well the near-nullspace
    mode B is locally representable after k steps of the scaled time
    evolution operator (I - dt D^{-1} A), restricted to the sparsity of A.

    Implementation: form the evolution operator product restricted to the
    pattern of A^k via masked SpGEMM (amg_core incomplete_mat_mult_csr
    analog — here scipy SpGEMM followed by pattern masking, which is
    numerically identical), then compute the angle-based measure against B
    and drop entries weaker than ``epsilon`` relative to the row minimum.
    """
    A = A.tocsr() if A.format not in ("csr", "bsr") else A
    bs = blocksize(A)
    Acsr = sp.csr_matrix(A)
    n = Acsr.shape[0]
    if B is None:
        B = np.ones((n, 1), dtype=Acsr.dtype)
    B = np.asarray(B)
    if B.ndim == 1:
        B = B.reshape(-1, 1)

    # Smallest nonzero |diag| scaling: dt = 1/rho(D^-1 A)
    d = Acsr.diagonal()
    with np.errstate(divide="ignore", invalid="ignore"):
        dinv = np.where(d != 0, 1.0 / d, 0.0)
    DinvA = sp.csr_matrix(Acsr.multiply(dinv[:, None]))
    rho = approximate_spectral_radius(DinvA)
    if rho == 0:
        rho = 1.0
    E = sp.identity(n, format="csr", dtype=Acsr.dtype) - (1.0 / rho) * DinvA

    # exact k-step evolution (k is small, default 2)
    Ek = E
    for _ in range(k - 1):
        Ek = sp.csr_matrix(Ek @ E)

    # angle measure: for row i, how well does column j's evolution entry
    # align with B?  Use the standard |1 - (Ek_ij B_j)/(Ek_ii B_i)| measure
    # generalized over candidates via a least-squares projection.
    Ek = sp.csr_matrix(Ek)
    rows = np.repeat(np.arange(n), np.diff(Ek.indptr))
    cols = Ek.indices
    vals = Ek.data

    if B.shape[1] == 1:
        # single candidate: ratio test — how accurately the evolved delta
        # at j predicts the near-nullspace value at i
        b = B[:, 0]
        diag_of_Ek = Ek.diagonal()
        with np.errstate(divide="ignore", invalid="ignore"):
            ref = diag_of_Ek[rows] * b[rows]
            cur = vals * b[cols]
            measure = np.abs(
                np.where(np.abs(ref) > 0, 1.0 - cur / np.where(ref == 0, 1, ref), np.inf)
            )
    else:
        # multi-candidate: per-row least-squares projection of the evolved
        # row onto span(B) over its neighborhood (the amg_core
        # evolution_strength_helper's constrained fit, batched over rows
        # padded to the max neighborhood size); the measure is the
        # pointwise projection error normalized by the entry magnitude.
        lens = np.diff(Ek.indptr)
        nmax = int(lens.max()) if n else 0
        mask = np.arange(nmax)[None, :] < lens[:, None]
        pad_cols = np.zeros((n, nmax), dtype=np.int64)
        pad_vals = np.zeros((n, nmax), dtype=np.float64)
        if Ek.nnz:
            pad_cols[mask] = cols
            pad_vals[mask] = np.real(vals)
        Bn = np.where(mask[:, :, None], B[pad_cols].real, 0.0)  # (n, m, k)
        # normal equations per row: (B^T B) c = B^T z
        G = np.einsum("nmk,nml->nkl", Bn, Bn)
        rhs = np.einsum("nmk,nm->nk", Bn, pad_vals)
        Ginv = G.copy()
        from .util.linalg import pinv_array

        pinv_array(Ginv)
        coef = np.einsum("nkl,nl->nk", Ginv, rhs)
        fit = np.einsum("nmk,nk->nm", Bn, coef)
        err = np.abs(pad_vals - fit)
        scale = np.maximum(np.abs(pad_vals), 1e-12)
        measure_pad = np.where(mask, err / scale, np.inf)
        measure = measure_pad[mask]

    offdiag = rows != cols
    measure = np.where(offdiag, measure, 0.0)
    # small measure = strong; drop if measure > epsilon * row-min
    big = np.where(offdiag & (measure > 0), measure, np.inf)
    rowmin = _row_reduce(big, Ek.indptr, n, np.minimum, empty=np.inf)
    finite_rowmin = np.where(np.isfinite(rowmin), rowmin, 0.0)
    keep = offdiag & (measure <= epsilon * np.maximum(finite_rowmin[rows], 1e-300)) & np.isfinite(measure)
    with np.errstate(divide="ignore", invalid="ignore"):
        strength = np.where(keep, 1.0 / np.maximum(measure, 1e-12), 0.0)
    keep_all = keep | ~offdiag
    data = np.where(keep, strength, 0.0)
    S = sp.csr_matrix(
        (data[keep_all], cols[keep_all], _recount_indptr(keep_all, Ek.indptr, n)),
        shape=(n, n),
    )
    if symmetrize_measure:
        S = 0.5 * (S + S.T)
        S = sp.csr_matrix(S)
    # restrict back to pattern of A (amalgamated if block)
    if bs > 1:
        pattern = _block_amalgamate(A.tobsr(), norm="abs")
    else:
        pattern = Acsr
    pattern = sp.csr_matrix(
        (np.ones(pattern.nnz), pattern.indices, pattern.indptr), shape=pattern.shape
    )
    if S.shape == pattern.shape:
        S = sp.csr_matrix(S.multiply(pattern))
    S = scale_rows_by_largest_entry(S)
    return _set_diagonal_to(S, 1.0)


def energy_based_strength_of_connection(A, theta=0.0, k=2):
    """Energy-based strength of connection.

    Rebuild of [R] pyamg/strength.py::energy_based_strength_of_connection.
    Approximates, for each connection (i, j), how much energy is lost when
    the delta function at j is approximated within row i's neighborhood
    after ``k`` weighted-Jacobi iterations on A z = 0 restricted to the
    pattern of A — a cheaper cousin of the evolution measure.
    """
    A = sp.csr_matrix(A) if A.format != "bsr" else _block_amalgamate(A)
    n = A.shape[0]
    d = A.diagonal()
    with np.errstate(divide="ignore", invalid="ignore"):
        dinv = np.where(d != 0, 1.0 / d, 0.0)
    DinvA = sp.csr_matrix(A.multiply(dinv[:, None]))
    rho = approximate_spectral_radius(DinvA)
    omega = 1.0 / max(rho, 1e-300)
    # Z approximates A^{-1} restricted to pattern: k Jacobi sweeps on AZ=I
    Z = sp.identity(n, format="csr", dtype=np.float64) .multiply(dinv[:, None])
    Z = sp.csr_matrix(Z)
    pattern = sp.csr_matrix((np.ones(A.nnz), A.indices, A.indptr), shape=A.shape)
    for _ in range(k):
        Znew = Z + omega * sp.csr_matrix((sp.identity(n, format="csr") - A @ Z).multiply(dinv[:, None]))
        Z = sp.csr_matrix(Znew.multiply(pattern))  # masked (incomplete) product
    # strength = |Z_ij| scaled by sqrt(Z_ii Z_jj)
    rows = np.repeat(np.arange(n), np.diff(Z.indptr))
    cols = Z.indices
    zd = np.abs(Z.diagonal())
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = np.sqrt(np.maximum(zd[rows] * zd[cols], 1e-300))
        measure = np.abs(Z.data) / denom
    offdiag = rows != cols
    rowmax = _row_reduce(np.where(offdiag, measure, 0.0), Z.indptr, n, np.maximum)
    keep = offdiag & (measure >= theta * rowmax[rows]) & (measure > 0)
    keep_all = keep | ~offdiag
    data = np.where(keep, measure, 0.0)
    S = sp.csr_matrix(
        (data[keep_all], cols[keep_all], _recount_indptr(keep_all, Z.indptr, n)),
        shape=(n, n),
    )
    S = scale_rows_by_largest_entry(S)
    return _set_diagonal_to(S, 1.0)
