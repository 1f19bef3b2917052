"""ctypes loader/builder for the native amg_core extension.

Compiles amg_core.cpp with g++ on first use (cached as a .so next to the
source, keyed by source hash).  Returns None when no compiler is
available so pure-NumPy fallbacks take over transparently.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "amg_core.cpp")

# names re-exported by the package when the extension loads
NATIVE_EXPORTS = [
    "symmetric_strength",
    "spgemm",
    "jacobi_smooth",
    "gauss_seidel",
    "standard_aggregation",
    "naive_aggregation",
    "pairwise_matching",
    "rs_cf_splitting",
    "rs_classical_interpolation",
    "rs_distance_two_interpolation",
    "gauss_seidel_indexed",
    "gauss_seidel_ne",
    "gauss_seidel_nr",
]

_cached = None
_tried = False


def _build():
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    sofile = os.path.join(_HERE, f"_amg_core_{digest}.so")
    # drop stale builds of older source revisions
    for old in os.listdir(_HERE):
        if (old.startswith("_amg_core_") and old.endswith(".so")
                and os.path.join(_HERE, old) != sofile):
            try:
                os.remove(os.path.join(_HERE, old))
            except OSError:
                pass
    if not os.path.exists(sofile):
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", "-fopenmp", _SRC, "-o", sofile,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as exc:
            warnings.warn(f"amg_core native build failed ({exc}); "
                          "using NumPy fallbacks")
            return None
    try:
        return ctypes.CDLL(sofile)
    except OSError as exc:
        warnings.warn(f"amg_core load failed ({exc}); using NumPy fallbacks")
        return None


class _Native:
    """Typed Python wrappers over the raw ctypes symbols."""

    def __init__(self, lib):
        self._lib = lib
        i64 = ctypes.POINTER(ctypes.c_int64)
        f64 = ctypes.POINTER(ctypes.c_double)
        lib.standard_aggregation.restype = ctypes.c_int64
        lib.standard_aggregation.argtypes = [ctypes.c_int64, i64, i64, i64, i64]
        lib.naive_aggregation.restype = ctypes.c_int64
        lib.naive_aggregation.argtypes = [ctypes.c_int64, i64, i64, i64, i64]
        lib.pairwise_matching.restype = ctypes.c_int64
        lib.pairwise_matching.argtypes = [ctypes.c_int64, i64, i64, f64,
                                          i64, i64]
        lib.rs_cf_splitting.restype = None
        lib.rs_cf_splitting.argtypes = [
            ctypes.c_int64, i64, i64, i64, i64, ctypes.c_int64, i64,
        ]
        i8 = ctypes.POINTER(ctypes.c_int8)
        i32 = ctypes.POINTER(ctypes.c_int32)
        lib.symmetric_strength.restype = ctypes.c_int64
        lib.symmetric_strength.argtypes = [
            ctypes.c_int64, i64, i64, f64, ctypes.c_double, f64, i8,
        ]
        i32_ = ctypes.POINTER(ctypes.c_int32)
        lib.symmetric_strength_i32.restype = ctypes.c_int64
        lib.symmetric_strength_i32.argtypes = [
            ctypes.c_int32, i32_, i32_, f64, ctypes.c_double, f64, i8,
        ]
        for suf, ci, pi in (("i32", ctypes.c_int32, i32),
                            ("i64", ctypes.c_int64, i64)):
            f = getattr(lib, f"spgemm_nnz_{suf}")
            f.restype = None
            f.argtypes = [ci, ci, pi, pi, pi, pi, pi]
            f = getattr(lib, f"spgemm_fill_{suf}")
            f.restype = None
            f.argtypes = [ci, ci, pi, pi, f64, pi, pi, f64, pi, pi, f64]
            f = getattr(lib, f"jacobi_smooth_nnz_{suf}")
            f.restype = None
            f.argtypes = [ci, ci, pi, pi, pi, pi, pi]
            f = getattr(lib, f"jacobi_smooth_fill_{suf}")
            f.restype = None
            f.argtypes = [ci, ci, pi, pi, f64, pi, pi, f64, f64,
                          ctypes.c_double, pi, pi, f64]
        lib.gauss_seidel.restype = None
        lib.gauss_seidel.argtypes = [
            ctypes.c_int64, i64, i64, f64, f64, f64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.rs_classical_interpolation_pass1.restype = None
        lib.rs_classical_interpolation_pass1.argtypes = [
            ctypes.c_int64, i64, i64, i8, i64, i64,
        ]
        lib.rs_classical_interpolation_pass2.restype = None
        lib.rs_classical_interpolation_pass2.argtypes = [
            ctypes.c_int64, i64, i64, f64, i8, i64, i64, ctypes.c_int64,
            i64, i64, f64,
        ]
        lib.rs_distance_two_interpolation_pass1.restype = None
        lib.rs_distance_two_interpolation_pass1.argtypes = [
            ctypes.c_int64, i64, i64, i8, i64, i64,
        ]
        lib.rs_distance_two_interpolation_pass2.restype = None
        lib.rs_distance_two_interpolation_pass2.argtypes = [
            ctypes.c_int64, i64, i64, f64, i8, i64, i64, ctypes.c_int64,
            i64, i64, f64,
        ]
        lib.gauss_seidel_indexed.restype = None
        lib.gauss_seidel_indexed.argtypes = [
            ctypes.c_int64, i64, i64, f64, f64, f64, i64, ctypes.c_int64,
        ]
        lib.gauss_seidel_nr.restype = None
        lib.gauss_seidel_nr.argtypes = [
            ctypes.c_int64, i64, i64, f64, f64, f64, f64,
            ctypes.c_int64, ctypes.c_double,
        ]
        lib.gauss_seidel_ne.restype = None
        lib.gauss_seidel_ne.argtypes = [
            ctypes.c_int64, i64, i64, f64, f64, f64, f64,
            ctypes.c_int64, ctypes.c_double,
        ]

    @staticmethod
    def _i64(a):
        return np.ascontiguousarray(a, dtype=np.int64)

    @staticmethod
    def _ptr_i(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    @staticmethod
    def _ptr_f(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    @staticmethod
    def _csr_idx(A, B=None):
        """Common index dtype + contiguous views for one or two CSRs."""
        import scipy.sparse as sp

        idx = np.promote_types(A.indptr.dtype,
                               B.indptr.dtype if B is not None else np.int32)
        if idx not in (np.dtype(np.int32), np.dtype(np.int64)):
            idx = np.dtype(np.int64)
        def cvt(M):
            return (np.ascontiguousarray(M.indptr, dtype=idx),
                    np.ascontiguousarray(M.indices, dtype=idx),
                    np.ascontiguousarray(M.data, dtype=np.float64))
        return idx, cvt

    def _ptr(self, a):
        return a.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32 if a.dtype == np.int32
                           else ctypes.c_int64))

    def spgemm(self, A, B):
        """C = A @ B (parallel Gustavson, row-sorted output), or None
        when the int32 output nnz could overflow."""
        import scipy.sparse as sp

        idx, cvt = self._csr_idx(A, B)
        suf = "i32" if idx == np.int32 else "i64"
        Ap, Aj, Ax = cvt(A)
        Bp, Bj, Bx = cvt(B)
        n_row, n_col = A.shape[0], B.shape[1]
        cnnz = np.zeros(n_row, dtype=idx)
        getattr(self._lib, f"spgemm_nnz_{suf}")(
            n_row, n_col, self._ptr(Ap), self._ptr(Aj), self._ptr(Bp),
            self._ptr(Bj), self._ptr(cnnz))
        Cp = np.zeros(n_row + 1, dtype=np.int64)
        np.cumsum(cnnz, out=Cp[1:])
        nnz = int(Cp[-1])
        if idx == np.int32 and nnz >= np.iinfo(np.int32).max:
            return None
        Cp = Cp.astype(idx, copy=False)
        Cj = np.empty(nnz, dtype=idx)
        Cx = np.empty(nnz, dtype=np.float64)
        getattr(self._lib, f"spgemm_fill_{suf}")(
            n_row, n_col, self._ptr(Ap), self._ptr(Aj), self._ptr_f(Ax),
            self._ptr(Bp), self._ptr(Bj), self._ptr_f(Bx), self._ptr(Cp),
            self._ptr(Cj), self._ptr_f(Cx))
        return sp.csr_matrix((Cx, Cj, Cp), shape=(n_row, n_col))

    def jacobi_smooth(self, A, P, dinv, omega):
        """OUT = P - omega * diag(dinv) @ (A @ P) fused (dinv=None ->
        identity scaling), or None on int32 overflow."""
        import scipy.sparse as sp

        idx, cvt = self._csr_idx(A, P)
        suf = "i32" if idx == np.int32 else "i64"
        Ap, Aj, Ax = cvt(A)
        Pp, Pj, Px = cvt(P)
        n_row, n_col = A.shape[0], P.shape[1]
        cnnz = np.zeros(n_row, dtype=idx)
        getattr(self._lib, f"jacobi_smooth_nnz_{suf}")(
            n_row, n_col, self._ptr(Ap), self._ptr(Aj), self._ptr(Pp),
            self._ptr(Pj), self._ptr(cnnz))
        Cp = np.zeros(n_row + 1, dtype=np.int64)
        np.cumsum(cnnz, out=Cp[1:])
        nnz = int(Cp[-1])
        if idx == np.int32 and nnz >= np.iinfo(np.int32).max:
            return None
        Cp = Cp.astype(idx, copy=False)
        Cj = np.empty(nnz, dtype=idx)
        Cx = np.empty(nnz, dtype=np.float64)
        dinv_arr = (np.ascontiguousarray(dinv, dtype=np.float64)
                    if dinv is not None else None)   # keep ref alive
        dptr = self._ptr_f(dinv_arr) if dinv_arr is not None else None
        getattr(self._lib, f"jacobi_smooth_fill_{suf}")(
            n_row, n_col, self._ptr(Ap), self._ptr(Aj), self._ptr_f(Ax),
            self._ptr(Pp), self._ptr(Pj), self._ptr_f(Px), dptr,
            ctypes.c_double(float(omega)), self._ptr(Cp), self._ptr(Cj),
            self._ptr_f(Cx))
        return sp.csr_matrix((Cx, Cj, Cp), shape=(n_row, n_col))

    def symmetric_strength(self, indptr, indices, data, theta):
        """Returns (data_out, keep, n_diag): row-scaled strength values
        aligned with the input nnz, survivor mask, stored-diag count.
        Uses the int32 entry point when scipy's index arrays are int32
        (no 21M-element upconversion copies)."""
        n = len(indptr) - 1
        data = np.ascontiguousarray(data, dtype=np.float64)
        data_out = np.empty(len(data), dtype=np.float64)
        keep = np.zeros(len(data), dtype=np.int8)
        kptr = keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
        if (np.asarray(indptr).dtype == np.int32
                and np.asarray(indices).dtype == np.int32):
            indptr = np.ascontiguousarray(indptr, dtype=np.int32)
            indices = np.ascontiguousarray(indices, dtype=np.int32)
            n_diag = self._lib.symmetric_strength_i32(
                n, self._ptr(indptr), self._ptr(indices),
                self._ptr_f(data), ctypes.c_double(float(theta)),
                self._ptr_f(data_out), kptr)
        else:
            indptr = self._i64(indptr)
            indices = self._i64(indices)
            n_diag = self._lib.symmetric_strength(
                n, self._ptr_i(indptr), self._ptr_i(indices),
                self._ptr_f(data), ctypes.c_double(float(theta)),
                self._ptr_f(data_out), kptr)
        return data_out, keep, int(n_diag)

    def standard_aggregation(self, indptr, indices):
        n = len(indptr) - 1
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        x = np.full(n, -1, dtype=np.int64)
        roots = np.empty(n, dtype=np.int64)
        n_agg = self._lib.standard_aggregation(
            n, self._ptr_i(indptr), self._ptr_i(indices),
            self._ptr_i(x), self._ptr_i(roots),
        )
        return x, roots[:n_agg].copy()

    def naive_aggregation(self, indptr, indices):
        n = len(indptr) - 1
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        x = np.full(n, -1, dtype=np.int64)
        roots = np.empty(n, dtype=np.int64)
        n_agg = self._lib.naive_aggregation(
            n, self._ptr_i(indptr), self._ptr_i(indices),
            self._ptr_i(x), self._ptr_i(roots),
        )
        return x, roots[:n_agg].copy()

    def pairwise_matching(self, indptr, indices, data, order):
        n = len(indptr) - 1
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        data = np.ascontiguousarray(data, dtype=np.float64)
        order = self._i64(order)
        assignment = np.full(n, -1, dtype=np.int64)
        count = self._lib.pairwise_matching(
            n, self._ptr_i(indptr), self._ptr_i(indices), self._ptr_f(data),
            self._ptr_i(order), self._ptr_i(assignment),
        )
        return assignment, int(count)

    def rs_cf_splitting(self, Sp, Sj, Tp, Tj, second_pass=False):
        n = len(Sp) - 1
        Sp, Sj = self._i64(Sp), self._i64(Sj)
        Tp, Tj = self._i64(Tp), self._i64(Tj)
        splitting = np.full(n, 2, dtype=np.int64)  # U_NODE = 2
        self._lib.rs_cf_splitting(
            n, self._ptr_i(Sp), self._ptr_i(Sj), self._ptr_i(Tp),
            self._ptr_i(Tj), 1 if second_pass else 0, self._ptr_i(splitting),
        )
        return splitting

    def gauss_seidel(self, indptr, indices, data, x, b, row_start,
                     row_stop, row_step):
        n = len(indptr) - 1
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        data = np.ascontiguousarray(data, dtype=np.float64)
        if x.dtype != np.float64 or not x.flags.c_contiguous:
            raise TypeError("x must be contiguous float64 for native GS")
        b = np.ascontiguousarray(b, dtype=np.float64)
        self._lib.gauss_seidel(
            n, self._ptr_i(indptr), self._ptr_i(indices), self._ptr_f(data),
            self._ptr_f(x), self._ptr_f(b),
            int(row_start), int(row_stop), int(row_step),
        )

    def rs_classical_interpolation(self, indptr, indices, data, strong,
                                   splitting, cmap, nc, modified=True):
        """Two-pass classical interpolation; returns scipy CSR P (n, nc)."""
        import scipy.sparse as sp

        n = len(indptr) - 1
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        data = np.ascontiguousarray(data, dtype=np.float64)
        strong = np.ascontiguousarray(strong, dtype=np.int8)
        splitting = self._i64(splitting)
        cmap = self._i64(cmap)
        counts = np.zeros(n, dtype=np.int64)
        p_i8 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
        self._lib.rs_classical_interpolation_pass1(
            n, self._ptr_i(indptr), self._ptr_i(indices), p_i8(strong),
            self._ptr_i(splitting), self._ptr_i(counts),
        )
        Pp = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=Pp[1:])
        nnz = int(Pp[-1])
        Pj = np.zeros(nnz, dtype=np.int64)
        Px = np.zeros(nnz, dtype=np.float64)
        self._lib.rs_classical_interpolation_pass2(
            n, self._ptr_i(indptr), self._ptr_i(indices), self._ptr_f(data),
            p_i8(strong), self._ptr_i(splitting), self._ptr_i(cmap),
            1 if modified else 0, self._ptr_i(Pp), self._ptr_i(Pj),
            self._ptr_f(Px),
        )
        P = sp.csr_matrix((Px, Pj, Pp), shape=(n, int(nc)))
        P.eliminate_zeros()
        P.sort_indices()
        return P

    def rs_distance_two_interpolation(self, indptr, indices, data, strong,
                                      splitting, cmap, nc, modified=True):
        """Two-pass distance-two interpolation; returns scipy CSR P."""
        import scipy.sparse as sp

        n = len(indptr) - 1
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        data = np.ascontiguousarray(data, dtype=np.float64)
        strong = np.ascontiguousarray(strong, dtype=np.int8)
        splitting = self._i64(splitting)
        cmap = self._i64(cmap)
        counts = np.zeros(n, dtype=np.int64)
        p_i8 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
        self._lib.rs_distance_two_interpolation_pass1(
            n, self._ptr_i(indptr), self._ptr_i(indices), p_i8(strong),
            self._ptr_i(splitting), self._ptr_i(counts),
        )
        Pp = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=Pp[1:])
        Pj = np.zeros(int(Pp[-1]), dtype=np.int64)
        Px = np.zeros(int(Pp[-1]), dtype=np.float64)
        self._lib.rs_distance_two_interpolation_pass2(
            n, self._ptr_i(indptr), self._ptr_i(indices), self._ptr_f(data),
            p_i8(strong), self._ptr_i(splitting), self._ptr_i(cmap),
            1 if modified else 0, self._ptr_i(Pp), self._ptr_i(Pj),
            self._ptr_f(Px),
        )
        P = sp.csr_matrix((Px, Pj, Pp), shape=(n, int(nc)))
        P.eliminate_zeros()
        P.sort_indices()
        return P

    def gauss_seidel_indexed(self, indptr, indices, data, x, b, order):
        n = len(order)
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        data = np.ascontiguousarray(data, dtype=np.float64)
        order = self._i64(order)
        if x.dtype != np.float64 or not x.flags.c_contiguous:
            raise TypeError("x must be contiguous float64 for native GS")
        b = np.ascontiguousarray(b, dtype=np.float64)
        self._lib.gauss_seidel_indexed(
            n, self._ptr_i(indptr), self._ptr_i(indices), self._ptr_f(data),
            self._ptr_f(x), self._ptr_f(b), self._ptr_i(order), n,
        )

    def gauss_seidel_nr(self, indptr, indices, data, x, r, col_norms,
                        direction, omega):
        ncols = len(indptr) - 1
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        data = np.ascontiguousarray(data, dtype=np.float64)
        if x.dtype != np.float64 or not x.flags.c_contiguous:
            raise TypeError("x must be contiguous float64 for native GS-NR")
        if r.dtype != np.float64 or not r.flags.c_contiguous:
            raise TypeError("r must be contiguous float64 for native GS-NR")
        col_norms = np.ascontiguousarray(col_norms, dtype=np.float64)
        self._lib.gauss_seidel_nr(
            ncols, self._ptr_i(indptr), self._ptr_i(indices),
            self._ptr_f(data), self._ptr_f(x), self._ptr_f(r),
            self._ptr_f(col_norms), int(direction), float(omega),
        )

    def gauss_seidel_ne(self, indptr, indices, data, x, b, row_norms,
                        direction, omega):
        n = len(indptr) - 1
        indptr = self._i64(indptr)
        indices = self._i64(indices)
        data = np.ascontiguousarray(data, dtype=np.float64)
        if x.dtype != np.float64 or not x.flags.c_contiguous:
            raise TypeError("x must be contiguous float64 for native GS-NE")
        b = np.ascontiguousarray(b, dtype=np.float64)
        row_norms = np.ascontiguousarray(row_norms, dtype=np.float64)
        self._lib.gauss_seidel_ne(
            n, self._ptr_i(indptr), self._ptr_i(indices), self._ptr_f(data),
            self._ptr_f(x), self._ptr_f(b), self._ptr_f(row_norms),
            int(direction), float(omega),
        )


def get_native():
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    if os.environ.get("PYAMG_TPU_NO_NATIVE"):
        return None
    lib = _build()
    if lib is not None:
        _cached = _Native(lib)
    return _cached
