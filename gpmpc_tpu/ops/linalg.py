"""Small dense linear-algebra utilities for controller setup.

Replaces the scipy native bits the reference leans on (SURVEY.md §2.2):
`scipy.linalg.expm` (/root/reference/gpmpc/gpmpc.py:524), `solve_discrete_are`
(:504), and the LQR gain assembly (:506). These run once at controller-setup time,
so they are implemented host-side in float64 numpy for robustness, with jnp-friendly
outputs; nothing here sits on the per-step hot path.
"""

from __future__ import annotations

import numpy as np


def discretize_linear_system(
    A: np.ndarray, B: np.ndarray, dt: float, exact: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Discretize (A, B): exact via expm of the stacked [[A, B], [0, 0]] * dt, or Euler.

    ≙ /root/reference/gpmpc/gpmpc.py:517-527.
    """
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    nx, nu = A.shape[1], B.shape[1]
    if exact:
        M = np.zeros((nx + nu, nx + nu))
        M[:nx, :nx] = A
        M[:nx, nx:] = B
        Md = _expm(M * dt)
        return Md[:nx, :nx], Md[:nx, nx:]
    return np.eye(nx) + A * dt, B * dt


def _expm(M: np.ndarray) -> np.ndarray:
    """Matrix exponential via scaling-and-squaring with a Padé(13) core."""
    try:  # scipy ships in this image as a transitive dep; fall back if absent.
        from scipy.linalg import expm as scipy_expm

        return scipy_expm(M)
    except ImportError:  # pragma: no cover
        # Scaling and squaring with Taylor series (sufficient for the small,
        # well-scaled matrices used at setup time).
        norm = np.linalg.norm(M, ord=np.inf)
        s = max(0, int(np.ceil(np.log2(max(norm, 1e-16)))) + 1)
        A = M / (2**s)
        E = np.eye(A.shape[0])
        term = np.eye(A.shape[0])
        for k in range(1, 20):
            term = term @ A / k
            E = E + term
        for _ in range(s):
            E = E @ E
        return E


def solve_discrete_are(
    A: np.ndarray, B: np.ndarray, Q: np.ndarray, R: np.ndarray, iters: int = 60
) -> np.ndarray:
    """Discrete algebraic Riccati equation via the structure-preserving doubling
    algorithm (quadratically convergent; no Schur decomposition needed).

    ≙ `scipy.linalg.solve_discrete_are` as used at /root/reference/gpmpc/gpmpc.py:504.
    """
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    Q = np.asarray(Q, dtype=np.float64)
    R = np.asarray(R, dtype=np.float64)
    n = A.shape[0]
    G = B @ np.linalg.solve(R, B.T)
    Ak, Gk, Hk = A.copy(), G.copy(), Q.copy()
    eye = np.eye(n)
    for _ in range(iters):
        W = eye + Gk @ Hk
        W_inv_A = np.linalg.solve(W, Ak)
        W_inv_G = np.linalg.solve(W, Gk)
        A_next = Ak @ W_inv_A
        G_next = Gk + Ak @ W_inv_G @ Ak.T
        H_next = Hk + W_inv_A.T @ Hk @ Ak
        if np.linalg.norm(H_next - Hk, ord="fro") <= 1e-14 * max(
            1.0, np.linalg.norm(Hk, ord="fro")
        ):
            Hk = H_next
            break
        Ak, Gk, Hk = A_next, G_next, H_next
    return 0.5 * (Hk + Hk.T)


def lqr_gain_discrete(
    A: np.ndarray, B: np.ndarray, Q: np.ndarray, R: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Infinite-horizon discrete LQR gain K = -(R + B'PB)^-1 B'PA and DARE solution P.

    ≙ GPMPC.setup_prior_dynamics, /root/reference/gpmpc/gpmpc.py:500-507.
    """
    P = solve_discrete_are(A, B, Q, R)
    btp = B.T @ P
    K = -np.linalg.solve(R + btp @ B, btp @ A)
    return K, P
