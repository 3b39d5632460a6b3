"""ctypes bindings for the native C++ OCP solver (native/ocp_solver.cpp).

Mirrors the reference's native boundary — acados compiles generated C to a shared
library and loads it through ctypes (/root/reference/gpmpc/mpc.py:57-58) — except
our native solver is a hand-written, model-independent IP/Riccati implementation:
no per-model codegen, compiled once. It serves as an independent double-precision
oracle for the JAX solvers and as a host/CPU fallback runtime.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libgpmpc_native.so"


def build_native_library(force: bool = False) -> Path:
    """Compile native/ocp_solver.cpp -> libgpmpc_native.so (cached)."""
    src = _NATIVE_DIR / "ocp_solver.cpp"
    if _LIB_PATH.exists() and not force:
        if _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
            return _LIB_PATH
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", str(_LIB_PATH), str(src)],
        check=True,
        capture_output=True,
    )
    return _LIB_PATH


# Family ids of the generic oracle entry points (native/ocp_solver.cpp).
NATIVE_FAMILIES = {"cartpole": 1, "twolink": 2}


class NativeOcpSolver:
    """Host-side box-constrained OCP-QP solver (double precision internally)."""

    def __init__(self):
        lib_path = build_native_library()
        self._lib = ctypes.CDLL(str(lib_path))
        f32p = ctypes.POINTER(ctypes.c_float)
        self._lib.gpmpc_native_solve_ocp_qp.restype = ctypes.c_int
        self._lib.gpmpc_native_solve_ocp_qp.argtypes = (
            [ctypes.c_int] * 3
            + [f32p] * 11
            + [ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float]
            + [f32p] * 2
        )
        self._lib.gpmpc_native_mpc_solve.restype = ctypes.c_int
        self._lib.gpmpc_native_mpc_solve.argtypes = (
            [f32p, ctypes.c_float, ctypes.c_int]
            + [f32p] * 10
            + [ctypes.c_int, ctypes.c_int, ctypes.c_float]
            + [f32p] * 2
        )
        f64p = ctypes.POINTER(ctypes.c_double)
        self._lib.gpmpc_native_tighten.restype = None
        self._lib.gpmpc_native_tighten.argtypes = (
            [ctypes.c_int, ctypes.c_int]
            + [f64p] * 11
            + [ctypes.c_double, ctypes.c_double]
            + [f64p] * 2
        )
        self._lib.gpmpc_native_gpmpc_solve.restype = ctypes.c_int
        self._lib.gpmpc_native_gpmpc_solve.argtypes = (
            [f32p, ctypes.c_float, ctypes.c_int, ctypes.c_int]
            + [f64p] * 4
            + [f32p] * 10
            + [ctypes.c_int, ctypes.c_int, ctypes.c_float]
            + [f32p] * 2
        )
        self._lib.gpmpc_native_family_tighten.restype = None
        self._lib.gpmpc_native_family_tighten.argtypes = (
            [ctypes.c_int] * 3
            + [f64p] * 11
            + [ctypes.c_double, ctypes.c_double]
            + [f64p] * 2
        )
        self._lib.gpmpc_native_family_gpmpc_solve.restype = ctypes.c_int
        self._lib.gpmpc_native_family_gpmpc_solve.argtypes = (
            [ctypes.c_int, f32p, ctypes.c_float, ctypes.c_int, ctypes.c_int]
            + [f64p] * 4
            + [f32p] * 10
            + [ctypes.c_int, ctypes.c_int, ctypes.c_float]
            + [f32p] * 2
        )

    def mpc_solve(
        self,
        params8: np.ndarray,  # quadrotor params [a..l]
        dt: float,
        x0: np.ndarray,  # (12,)
        xref: np.ndarray,  # (T+1, 12)
        uref: np.ndarray,  # (T, 4)
        qdiag: np.ndarray,  # (12,)
        rdiag: np.ndarray,  # (4,)
        qediag: np.ndarray,  # (12,)
        lx: np.ndarray, ux: np.ndarray,  # (12,)
        lu: np.ndarray, uu: np.ndarray,  # (4,)
        X_warm: np.ndarray,  # (T+1, 12)
        U_warm: np.ndarray,  # (T, 4)
        sqp_iters: int = 25,
        qp_iters: int = 20,
        step_tol: float = 1e-6,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full nominal-MPC solve on the host — the independent full-stack oracle
        (dynamics + finite-difference Jacobians + SQP + IP in double precision)."""
        T = uref.shape[0]
        f32c = lambda a: np.ascontiguousarray(a, dtype=np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        X = f32c(X_warm).copy()
        U = f32c(U_warm).copy()
        args = [f32c(a) for a in (params8, x0, xref, uref, qdiag, rdiag, qediag, lx, ux, lu, uu)]
        status = self._lib.gpmpc_native_mpc_solve(
            args[0].ctypes.data_as(f32p), dt, T,
            *[a.ctypes.data_as(f32p) for a in args[1:]],
            sqp_iters, qp_iters, step_tol,
            X.ctypes.data_as(f32p), U.ctypes.data_as(f32p),
        )
        if status != 0:
            raise RuntimeError(f"native MPC solver failed with status {status}")
        return X, U

    def tighten(
        self,
        X_prev: np.ndarray,  # (T+1, 12) previous solution
        U_prev: np.ndarray,  # (T, 4)
        var_Z: np.ndarray,   # (3, Ms, 3)
        var_mat: np.ndarray,  # (3, Ms, Ms)
        var_mask: np.ndarray,  # (3, Ms)
        inv_ell2: np.ndarray,  # (3, 3)
        sf2: np.ndarray,  # (3,)
        noise: np.ndarray,  # (3,)
        Ad: np.ndarray,  # (12, 12)
        Bd_in: np.ndarray,  # (12, 4)
        lqr_gain: np.ndarray,  # (4, 12)
        ppf: float,
        dt: float,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Chance-constraint tightenings (t_x (T+1, 12), t_u (T, 4)) from the
        GP predictive variance along the previous solution — the independent
        double-precision oracle for control/gpmpc.py::propagate_constraint_limits."""
        T = U_prev.shape[0]
        ms = var_Z.shape[1]
        f64c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
        f64p = ctypes.POINTER(ctypes.c_double)
        args = [f64c(a) for a in (X_prev, U_prev, var_Z, var_mat, var_mask,
                                  inv_ell2, sf2, noise, Ad, Bd_in, lqr_gain)]
        t_x = np.zeros((T + 1, 12), np.float64)
        t_u = np.zeros((T, 4), np.float64)
        self._lib.gpmpc_native_tighten(
            T, ms, *[a.ctypes.data_as(f64p) for a in args],
            float(ppf), float(dt),
            t_x.ctypes.data_as(f64p), t_u.ctypes.data_as(f64p),
        )
        return t_x, t_u

    def gpmpc_solve(
        self,
        params8: np.ndarray,
        dt: float,
        gp_Zs: np.ndarray,       # (3, Ms, 3) mean-inducing inputs
        gp_alpha: np.ndarray,    # (3, Ms)
        gp_inv_ell2: np.ndarray,  # (3, 3)
        gp_sf2: np.ndarray,      # (3,)
        x0: np.ndarray,
        xref: np.ndarray,  # (T+1, 12)
        uref: np.ndarray,  # (T, 4)
        qdiag: np.ndarray,
        rdiag: np.ndarray,
        qediag: np.ndarray,
        lx_stage: np.ndarray, ux_stage: np.ndarray,  # (T+1, 12) tightened boxes
        lu_stage: np.ndarray, uu_stage: np.ndarray,  # (T, 4)
        X_warm: np.ndarray,
        U_warm: np.ndarray,
        sqp_iters: int = 25,
        qp_iters: int = 20,
        step_tol: float = 1e-6,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full GP-MPC solve (GP-augmented dynamics + per-stage tightened
        bounds) — the external oracle for GPMPC.select_action's solve step."""
        T = uref.shape[0]
        ms = gp_Zs.shape[1]
        f32c = lambda a: np.ascontiguousarray(a, dtype=np.float32)
        f64c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        X = f32c(X_warm).copy()
        U = f32c(U_warm).copy()
        gp_args = [f64c(a) for a in (gp_Zs, gp_alpha, gp_inv_ell2, gp_sf2)]
        args = [f32c(a) for a in (params8, x0, xref, uref, qdiag, rdiag, qediag,
                                  lx_stage, ux_stage, lu_stage, uu_stage)]
        status = self._lib.gpmpc_native_gpmpc_solve(
            args[0].ctypes.data_as(f32p), dt, T, ms,
            *[a.ctypes.data_as(f64p) for a in gp_args],
            *[a.ctypes.data_as(f32p) for a in args[1:]],
            sqp_iters, qp_iters, step_tol,
            X.ctypes.data_as(f32p), U.ctypes.data_as(f32p),
        )
        if status != 0:
            raise RuntimeError(f"native GP-MPC solver failed with status {status}")
        return X, U

    # -- family-generic oracle (cartpole / two-link) ---------------------------
    # The quadrotor keeps its dedicated entry points (rotated mean/variance
    # injection); these families share identity var_factors and direct row
    # injection, so one generic C++ path covers both.

    def family_tighten(
        self,
        family: str,
        X_prev: np.ndarray,   # (T+1, nx)
        U_prev: np.ndarray,   # (T, nu)
        var_Z: np.ndarray,    # (G, Ms, D)
        var_mat: np.ndarray,  # (G, Ms, Ms)
        var_mask: np.ndarray,  # (G, Ms)
        inv_ell2: np.ndarray,  # (G, D)
        sf2: np.ndarray,      # (G,)
        noise: np.ndarray,    # (G,)
        Ad: np.ndarray, Bd_in: np.ndarray, lqr_gain: np.ndarray,
        ppf: float, dt: float,
    ) -> tuple[np.ndarray, np.ndarray]:
        fam = NATIVE_FAMILIES[family]
        T, nu = U_prev.shape
        nx = X_prev.shape[1]
        ms = var_Z.shape[1]
        f64c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
        f64p = ctypes.POINTER(ctypes.c_double)
        args = [f64c(a) for a in (X_prev, U_prev, var_Z, var_mat, var_mask,
                                  inv_ell2, sf2, noise, Ad, Bd_in, lqr_gain)]
        t_x = np.zeros((T + 1, nx), np.float64)
        t_u = np.zeros((T, nu), np.float64)
        self._lib.gpmpc_native_family_tighten(
            fam, T, ms, *[a.ctypes.data_as(f64p) for a in args],
            float(ppf), float(dt),
            t_x.ctypes.data_as(f64p), t_u.ctypes.data_as(f64p),
        )
        return t_x, t_u

    def family_gpmpc_solve(
        self,
        family: str,
        params: np.ndarray,      # family plant params (padded to 8)
        dt: float,
        gp_Zs: np.ndarray,       # (G, Ms, D)
        gp_alpha: np.ndarray,    # (G, Ms)
        gp_inv_ell2: np.ndarray,  # (G, D)
        gp_sf2: np.ndarray,      # (G,)
        x0: np.ndarray,
        xref: np.ndarray,        # (T+1, nx)
        uref: np.ndarray,        # (T, nu)
        qdiag: np.ndarray, rdiag: np.ndarray, qediag: np.ndarray,
        lx_stage: np.ndarray, ux_stage: np.ndarray,  # (T+1, nx)
        lu_stage: np.ndarray, uu_stage: np.ndarray,  # (T, nu)
        X_warm: np.ndarray, U_warm: np.ndarray,
        sqp_iters: int = 25, qp_iters: int = 20, step_tol: float = 1e-6,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full GP-MPC solve for a non-quadrotor family (ms = 0 rows of
        alpha=0 still run the GP path; pass a (G, 0, D) Zs for nominal)."""
        fam = NATIVE_FAMILIES[family]
        T = uref.shape[0]
        ms = gp_Zs.shape[1]
        p8 = np.zeros(8, np.float32)
        p8[: len(params)] = np.asarray(params, np.float32)
        f32c = lambda a: np.ascontiguousarray(a, dtype=np.float32)
        f64c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        X = f32c(X_warm).copy()
        U = f32c(U_warm).copy()
        gp_args = [f64c(a) for a in (gp_Zs, gp_alpha, gp_inv_ell2, gp_sf2)]
        args = [f32c(a) for a in (x0, xref, uref, qdiag, rdiag, qediag,
                                  lx_stage, ux_stage, lu_stage, uu_stage)]
        status = self._lib.gpmpc_native_family_gpmpc_solve(
            fam, p8.ctypes.data_as(f32p), dt, T, ms,
            *[a.ctypes.data_as(f64p) for a in gp_args],
            *[a.ctypes.data_as(f32p) for a in args],
            sqp_iters, qp_iters, step_tol,
            X.ctypes.data_as(f32p), U.ctypes.data_as(f32p),
        )
        if status != 0:
            raise RuntimeError(f"native family GP-MPC solve failed: {status}")
        return X, U

    def solve(
        self,
        A: np.ndarray,  # (T, nx, nx)
        B: np.ndarray,  # (T, nx, nu)
        r: np.ndarray,  # (T, nx)
        qdiag: np.ndarray,  # (T+1, nx)
        qx: np.ndarray,  # (T+1, nx)
        rdiag: np.ndarray,  # (T, nu)
        ru: np.ndarray,  # (T, nu)
        lx: np.ndarray,
        ux: np.ndarray,
        lu: np.ndarray,
        uu: np.ndarray,
        n_ip: int = 15,
        mu0: float = 1e-1,
        sigma: float = 0.2,
        tau: float = 0.995,
    ) -> tuple[np.ndarray, np.ndarray]:
        T, nx, nu = A.shape[0], A.shape[1], B.shape[2]
        f32c = lambda a: np.ascontiguousarray(a, dtype=np.float32)
        args = [f32c(a) for a in (A, B, r, qdiag, qx, rdiag, ru, lx, ux, lu, uu)]
        dx = np.zeros((T + 1, nx), np.float32)
        du = np.zeros((T, nu), np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        status = self._lib.gpmpc_native_solve_ocp_qp(
            T, nx, nu,
            *[a.ctypes.data_as(f32p) for a in args],
            n_ip, mu0, sigma, tau,
            dx.ctypes.data_as(f32p), du.ctypes.data_as(f32p),
        )
        if status != 0:
            raise RuntimeError(f"native OCP solver failed with status {status}")
        return dx, du
