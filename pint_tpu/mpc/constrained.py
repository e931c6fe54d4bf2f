"""Hard linear state constraints: augmented-Lagrangian fixed-point MPC.

The condensed solvers in this package enforce only the control box (the
int8 lane saturation boundary).  This module adds **hard polytopic state
constraints** ``lo <= F x_k <= hi`` for every step of the horizon -- the
missing half of real MPC problems (corridor bounds, velocity limits,
actuator-rate limits expressed on states).

No counterpart exists in the reference library (SURVEY.md section 2.4): this
extends the BASELINE.json MPC capability layer.  The method is the standard
two-sided augmented Lagrangian in its projection form (the same shape OSQP
uses for its dual updates):

    c(U, x0) = S U + P x0 + r          (stacked F x_k rows, k = 1..T)
    L(U, lam) = f(U) + rho/2 * dist^2(c + lam/rho, [lo, hi]) - |lam|^2/(2 rho)

    inner:  minimize_U L over the control box   (projected gradient)
    outer:  lam <- rho * (t - Pi(t)),  t = c(U*) + lam/rho

which on the TPU decomposes into exactly the primitives the fixed-point PGD
solver already uses, plus two extra int8 MXU matmuls per inner iteration
(``lanes @ Sq^T`` for the constraint evaluation and ``y8 @ Sq`` for the
penalty gradient).  The quantized device solver lives in this module too
(:class:`ConstrainedPGD`); this file's host tier provides the float64
reference (same iteration, same projection form) that the quantized solver
is tolerance-checked against, mirroring ``CondensedQP.solve_pgd``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from pint_tpu.mpc.condensed import CondensedQP

__all__ = [
    "StateConstrainedQP",
    "constrain_states",
]


@dataclasses.dataclass(frozen=True)
class StateConstrainedQP:
    """A condensed QP plus stacked linear state constraints.

    minimize 1/2 U^T H U + g(x0)^T U
    s.t.     |U| <= u_max                      (control box)
             lo <= S U + P x0 + r <= hi        (state rows, C of them)
    """

    qp: CondensedQP
    S: np.ndarray        # (C, Tm)
    P: np.ndarray        # (C, n)
    r: np.ndarray        # (C,)
    lo: np.ndarray       # (C,)
    hi: np.ndarray       # (C,)
    penalty_lipschitz: float   # lambda_max(S^T S)

    def constraint(self, U: np.ndarray, x0: np.ndarray) -> np.ndarray:
        """c(U, x0), batched over leading dims."""
        return U @ self.S.T + np.atleast_2d(x0) @ self.P.T + self.r

    def solve_alm(
        self,
        x0: np.ndarray,
        rho: float = 10.0,
        outer: int = 12,
        inners: int = 60,
        step: Optional[float] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Float64 augmented-Lagrangian reference solver (CPU oracle).

        Batched over leading dims of x0.  Returns ``(U, lam)``.  The
        quantized device solver runs this exact iteration in fixed point;
        tests check both against scipy and KKT residuals.

        Structurally infeasible starts (no control keeps the state inside
        the bounds) degrade gracefully: the penalty form converges to a
        bounded least-violation compromise instead of diverging, the MPC
        equivalent of a soft-constraint fallback.
        """
        qp = self.qp
        x0 = np.atleast_2d(np.asarray(x0, np.float64))
        B = x0.shape[0]
        Tm = qp.H.shape[0]
        C = self.S.shape[0]
        L = qp.lipschitz + rho * self.penalty_lipschitz
        alpha = step if step is not None else 1.0 / L
        U = np.zeros((B, Tm))
        lam = np.zeros((B, C))
        cx0 = x0 @ self.P.T + self.r          # (B, C)
        g0 = x0 @ qp.G.T + qp.g_ref           # (B, Tm)
        for _ in range(outer):
            for _ in range(inners):
                t = U @ self.S.T + cx0 + lam / rho
                y = t - np.clip(t, self.lo, self.hi)
                grad = U @ qp.H.T + g0 + rho * (y @ self.S)
                U = np.clip(U - alpha * grad, -qp.u_max, qp.u_max)
            t = U @ self.S.T + cx0 + lam / rho
            lam = rho * (t - np.clip(t, self.lo, self.hi))
        return np.squeeze(U) if x0.ndim == 1 else U, lam

    def kkt_residual(
        self, U: np.ndarray, lam: np.ndarray, x0: np.ndarray
    ) -> np.ndarray:
        """Natural-map KKT residual ||U - Pi_box(U - grad L)||_inf per
        problem: zero exactly at a constrained optimum."""
        qp = self.qp
        U = np.atleast_2d(np.asarray(U, np.float64))
        x0 = np.atleast_2d(np.asarray(x0, np.float64))
        g0 = x0 @ qp.G.T + qp.g_ref
        grad = U @ qp.H.T + g0 + np.atleast_2d(lam) @ self.S
        proj = np.clip(U - grad, -qp.u_max, qp.u_max)
        return np.abs(U - proj).max(axis=-1)


def constrain_states(
    qp: CondensedQP,
    A_seq: np.ndarray,
    B_seq: np.ndarray,
    c_seq: Optional[np.ndarray],
    F: np.ndarray,
    lo,
    hi,
) -> StateConstrainedQP:
    """Stack per-step state constraints ``lo <= F x_k <= hi`` (k = 1..T)
    into condensed rows over the decision vector U.

    ``A_seq``/``B_seq`` are (T, n, n)/(T, n, m) -- pass ``np.broadcast_to``
    of the LTI pair for time-invariant plants; ``c_seq`` (T, n) or None are
    the affine offsets (LTV/SQP linearizations).  ``F`` is (Cs, n); ``lo``,
    ``hi`` are scalars or (Cs,) and apply at every step.

    The propagators are the same forward recursion as
    :func:`pint_tpu.mpc.condensed.condense_ltv` (Abar_k = A_k Abar_{k-1},
    ...); rows for step k read  F Bbar_k U + F Abar_k x0 + F Cbar_k.
    """
    A_seq = np.asarray(A_seq, float)
    B_seq = np.asarray(B_seq, float)
    T, n, m = B_seq.shape
    if A_seq.shape != (T, n, n):
        raise ValueError(f"A_seq {A_seq.shape} vs B_seq {B_seq.shape}")
    c_seq = np.zeros((T, n)) if c_seq is None else np.asarray(c_seq, float)
    F = np.atleast_2d(np.asarray(F, float))
    Cs = F.shape[0]
    if F.shape[1] != n:
        raise ValueError(f"F has {F.shape[1]} columns, state dim is {n}")
    lo = np.broadcast_to(np.asarray(lo, float), (Cs,))
    hi = np.broadcast_to(np.asarray(hi, float), (Cs,))
    if np.any(lo >= hi):
        raise ValueError("state constraint lo must be < hi per row")

    S = np.zeros((T * Cs, T * m))
    P = np.zeros((T * Cs, n))
    r = np.zeros(T * Cs)
    Bbar = np.zeros((n, T * m))
    Ak_prod = np.eye(n)
    c_acc = np.zeros(n)
    for k in range(T):
        Ak_prod = A_seq[k] @ Ak_prod
        if k:
            Bbar = A_seq[k] @ Bbar
        Bbar[:, k * m : (k + 1) * m] = B_seq[k]
        c_acc = A_seq[k] @ c_acc + c_seq[k]
        S[k * Cs : (k + 1) * Cs] = F @ Bbar
        P[k * Cs : (k + 1) * Cs] = F @ Ak_prod
        r[k * Cs : (k + 1) * Cs] = F @ c_acc

    pen_lip = float(np.linalg.eigvalsh(S.T @ S).max())
    return StateConstrainedQP(
        qp=qp,
        S=S,
        P=P,
        r=r,
        lo=np.tile(lo, T),
        hi=np.tile(hi, T),
        penalty_lipschitz=pen_lip,
    )
