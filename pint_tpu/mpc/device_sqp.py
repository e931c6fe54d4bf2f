"""Device-resident quantized SQP: the entire nonlinear-MPC iteration on-chip.

:class:`~pint_tpu.mpc.ltv.QuantizedSQP` condenses on host (float64 numpy)
and solves on device -- right for small batches and for oracle-grade
accuracy.  :class:`DeviceSQP` moves the WHOLE loop into one jitted XLA
program so thousands of nonlinear trajectory optimizations run per launch
with zero host round-trips:

* nominal rollout + linearization: the model's float32 jnp twins
  (``rollout_f32`` / ``linearize_f32`` -- same discrete maps, same
  quadratic trig as the f64 references),
* condensation: the T-step propagator recursion (``propagate="auto"``:
  unrolled static-injection form from T=24 up, lax.scan below -- the
  measured per-horizon winners), then the symmetric-square f32 MXU
  contraction (``reduce="sym"``).  A closed-form alternative
  (``propagate="allpairs"``: log-depth `associative_scan` prefix
  products + one masked einsum S[k,j] = P_k (P_j^-1 B_j)) is kept as
  a cross-check but measures 5x slower on chip -- see the
  ``propagate``/``reduce`` field docstrings for the numbers,
* Lipschitz constant: power iteration on the condensed Hessian (PSD, so
  the iterate converges to lambda_max; a 1.05 safety factor keeps the PGD
  step conservative against the truncated iteration),
* quantization: int8 Hessian + int32 step rationals computed on device
  (exp2/log2 on f32 scalars -- f32 mantissa error lands orders of
  magnitude below the int8 rounding it feeds),
* inner solve: the same fixed-point PGD with error feedback as the host
  path (:func:`pint_tpu.mpc.ltv._pgd_batched_h` -- int8 MXU matmuls,
  saturating packed control updates).

Everything is static-shaped and data-independent in control flow: one
compile serves every batch of the same geometry, and `shard_map`/`vmap`
batch it across a dp mesh like every other solver in the package.

Accuracy: f32 condensation differs from the host's f64 by ~1e-7 relative,
far below the int8 quantization it feeds; final true costs match the host
path to well under a percent (tests/test_device_sqp.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pint_tpu.mpc.ltv import (
    _pgd_batched_h,
    _pgd_batched_h_cols,
    _pgd_batched_h_cols_hqt,
)
from pint_tpu.models.dynamics import Unicycle, unpack_controls

Array = jax.Array

__all__ = ["DeviceSQP"]


def _inv_unrolled(M: Array) -> Array:
    """Batched small-matrix inverse by pivot-free Gauss-Jordan.

    The lane dim n is static (2..6 for the model zoo) so the elimination
    unrolls into n elementwise row updates over the (B, T) batch — pure
    VPU work, no LU kernels (``jnp.linalg.inv``'s batched LU measures
    catastrophically slow on TPU for tiny matrices).  Pivot-free is exact
    here: the inputs are one-step discretizations A = I + O(dt), so the
    diagonal never degenerates.
    """
    n = M.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
    aug = jnp.concatenate([M, eye], axis=-1)               # (..., n, 2n)
    for p in range(n):
        pivot = aug[..., p, :] / aug[..., p, p : p + 1]
        aug = aug - aug[..., :, p : p + 1] * pivot[..., None, :]
        aug = aug.at[..., p, :].set(pivot)
    return aug[..., :, n:]


def _block_diag(D: Array) -> Array:
    """(B, T, m, m) per-step blocks -> (B, T*m, T*m) block diagonal."""
    T, m = D.shape[1], D.shape[2]
    eye = jnp.eye(T, dtype=D.dtype)
    full = jnp.einsum("bpij,pq->bpiqj", D, eye)
    return full.reshape(-1, T * m, T * m)


@dataclasses.dataclass(frozen=True)
class DeviceSQP:
    """On-device SQP trajectory optimizer on packed int8 plans.

    Same problem definition as :class:`QuantizedSQP` (symmetric lane box,
    cost sum (x_k - x_ref)^T Q (x_k - x_ref) + u^T R u, terminal Qf);
    the model must expose ``rollout_f32`` / ``linearize_f32`` /
    ``lane_scales``.  ``T * n_ctrl`` must be a multiple of 4 (packing).
    """

    model: object = dataclasses.field(default_factory=Unicycle)
    horizon: int = 48
    Q: np.ndarray = dataclasses.field(
        default_factory=lambda: np.diag([1.0, 1.0, 0.02])
    )
    R: np.ndarray = dataclasses.field(
        default_factory=lambda: np.diag([0.02, 0.02])
    )
    qf_scale: float = 20.0
    Qf: object = None
    """Explicit terminal weight (overrides qf_scale * Q); see
    mpc.condensed.dare_terminal."""
    x_ref: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    sqp_iters: int = 6
    pgd_iters: int = 40
    g_shift: int = 12
    power_iters: int = 16
    propagate: str = "auto"
    """Condensation propagator construction.  "auto" (default, round 5)
    resolves by horizon to the measured end-to-end winner: "unroll"
    (fully unrolled recursion with static slice injection — skips the
    ~100 MB mostly-zero injection tensor and its reshape) for T >= 24,
    "scan" (sequential lax.scan recursion) below.  With the round-5
    ``reduce="sym"`` contraction, unroll wins every horizon from T=32
    up — T=32 331.3K vs 285.3K, T=50 124.7K vs 107.5K, T=64 95.9K vs
    84.5K, T=128 26.4K vs 21.4K solves/s — and washes at T=16 (797K vs
    812K); round 4 measured the OPPOSITE ordering (unroll 27% slower)
    against the einsum reduce, i.e. the reduce rewrite shifted which
    propagate form fuses better (EXP_PROP.json; decide from end-to-end
    rates, CLAUDE.md).  Unroll's first-call compile is ~2x the scan's
    (43.8 vs 23.2 s at T=128, cached thereafter).  "allpairs" (log-depth
    prefix products + one masked einsum) stays a numerical cross-check:
    5x slower (its tiny-contraction einsums lower poorly).  All paths
    agree to f32 roundoff and are each bit-deterministic end to end
    (tests/test_device_sqp.py::test_propagate_paths_agree)."""
    reduce: str = "sym"
    """Condensed-Hessian contraction form.  "sym" (default, round 5):
    the symmetric-square path Ht = W^T W with W = L^T-weighted stacks
    (Q = L L^T) -- the round-5 profiler trace (EXP_REDUCE_TRACE.json)
    observed that ~1.45 ms of the 3.3 ms einsum condensation is bf16
    hi/lo operand splits + relayout copies XLA materializes per
    DISTINCT operand of its 3-pass f32 MXU dot, and contracting one
    stack against ITSELF halves that.  Measured END TO END on chip
    (EXP_SYM.json): T=32 287.0K vs einsum 245.4K solves/s (+17%),
    T=50 107.7K vs 101.7K, T=64 84.4K vs 77.9K.  Needs Q PSD (a
    ValueError with a hint fires otherwise -- use "einsum" for the
    pathological indefinite-Q case).  "einsum": the round-2..4
    two-einsum BQ/Ht default.  "blocked": 2x2 block-triangular +
    symmetric mirror (~2x fewer MXU FLOPs -- measured 24% SLOWER end
    to end).  "btrans": explicit batch-leading transposes + one clean
    batched GEMM (4% slower).  All agree to f32 roundoff
    (tests/test_device_sqp.py).  A bf16-OPERAND contraction was also
    measured and REMOVED: 11% slower AND 3-6% final-cost deviation
    (EXP_BF16.json; distinct from "sym", which keeps f32 semantics and
    only reduces how often XLA's own bf16 split-copies materialize).
    The alternatives stay as measured cross-checks
    (EXP_CONDENSE.json / EXP_BTRANS.json)."""
    fused: "bool | None" = None
    """Run the PGD inner as the VMEM-resident Pallas kernel
    (:func:`pint_tpu.mpc.fused_alm.pgd_fused_words`).  ``None``
    auto-selects: kernel on TPU backends, XLA elsewhere.  The inner is
    bit-identical to ``_pgd_batched_h`` given identical operands
    (tests/test_fused_alm.py; verified natively on chip).  With the
    default ``lipq`` kernel, FULL fused vs XLA solves are bit-identical
    on chip too -- EXP_R4.json measures 0/4096 problems differing at the
    headline config, closing the round-3 80/4096 crack: the quantization
    roundings happen inside one Pallas kernel whose compilation cannot
    vary with the inner choice (with ``lipq=False`` the XLA lip/quantize
    reductions compile differently around the custom call and ties land
    on adjacent roundings; ``optimization_barrier`` alone measured
    insufficient, and per-program strict-precision options are ignored
    by the axon AOT compiler -- exp_strict_precision.py).
    ``sharded_solve_words`` honors the same flag on dp-major (tp == 1)
    meshes, where per-shard solves need no in-loop psum -- the DEFAULT
    TPU path is the fused kernel in both entry points, so
    solve == dp-sharded-solve holds bit-exactly.  On tp > 1 meshes the
    per-iteration psum cannot live inside one kernel, so the column
    path runs the matvec as a Pallas kernel launched per iteration with
    the exact int32 psum between launches
    (:func:`~pint_tpu.mpc.ltv._pgd_batched_h_cols_hqt`) -- bit-identical
    to the pure-XLA column solver, 3.9x faster on the matvec
    (EXP_TP_FUSED.json)."""
    fused_block: int = 128
    lipq: "bool | None" = None
    """Run the condensation epilogue (power-iteration Lipschitz + int8
    Hessian quantization) as the VMEM-resident Pallas kernel
    (:func:`pint_tpu.mpc.condense_fused.lipq_fused`) instead of the XLA
    ``_lipschitz_phase`` + ``_quantize_phase`` pair.  The kernel loads
    each batch block's Ht slab into VMEM ONCE (the XLA pair re-streams it
    ``power_iters + 2`` times from HBM) and emits the int8 Hessian
    directly in the fused inner's batch-last orientation, skipping both
    16 MB int8 transposes.  ``None`` auto-selects: kernel on TPU
    backends, XLA elsewhere.  Chip-validated (EXP_R4.json): the int8
    quantization is bit-exact vs the XLA recompute given the kernel's
    own scales, the Lipschitz estimate tracks the XLA power iteration to
    7e-7 relative, and the headline solves/s moves 221.6K -> 234.4K.
    The kernel's power iteration accumulates in a fixed unrolled order,
    so its quantization is a self-consistent sibling of the XLA pair's
    (last-ulp lip differences can move quantization ties); within either
    setting the fused and XLA inners stay bit-identical
    (tests/test_condense_fused.py, and on chip EXP_R4.json)."""
    lipq_block: int = 128

    @functools.cached_property
    def _Qf(self) -> np.ndarray:
        if self.Qf is not None:
            return np.asarray(self.Qf, float)
        return self.qf_scale * np.asarray(self.Q, float)

    def __post_init__(self):
        if self.propagate not in ("allpairs", "auto", "scan", "unroll"):
            raise ValueError(
                f"propagate must be 'allpairs', 'auto', 'scan' or "
                f"'unroll', got {self.propagate!r}"
            )
        if self.reduce not in ("einsum", "blocked", "btrans", "sym"):
            raise ValueError(
                f"reduce must be 'einsum', 'blocked', 'btrans' or "
                f"'sym', got {self.reduce!r}"
            )
        if self.n_dec % 4:
            raise ValueError(
                f"horizon*n_ctrl = {self.n_dec} must be a multiple of 4 "
                "(int8 lanes pack 4-per-word)"
            )

    @functools.cached_property
    def _lane_scales(self) -> np.ndarray:
        return np.asarray(self.model.lane_scales, np.float64)

    @property
    def n_ctrl(self) -> int:
        return len(self._lane_scales)

    @property
    def n_dec(self) -> int:
        return self.n_ctrl * self.horizon

    def init_words(self, batch: int) -> Array:
        return jnp.zeros((batch, self.n_dec // 4), jnp.uint32)

    # -- on-device condensation -------------------------------------------------
    #
    # Split into phase methods so the bench can time each stage exactly as
    # composed (bench.py bench_device_sqp_phases; VERDICT round-1 item 4):
    # _linearize_phase -> _condense_hg (_propagate_scan -> _reduce_phase
    # on the default path, or the allpairs closed form as cross-check) ->
    # _lipschitz_phase -> _quantize_phase, composed by _condense_dev.

    def _linearize_phase(self, x0_f: Array, lanes: Array):
        """f32 rollout + linearization around the current lane plan.

        Returns (A_seq (B,T,n,n), B_lane (B,T,n,m) already lane-scaled,
        c_seq (B,T,n) affine residuals).
        """
        T, m = self.horizon, self.n_ctrl
        s = jnp.asarray(self._lane_scales, jnp.float32)
        u_phys = lanes.reshape(-1, T, m).astype(jnp.float32) * s
        traj = self.model.rollout_f32(x0_f, u_phys)          # (B, T+1, n)
        n = traj.shape[-1]
        if np.asarray(self.Q).shape != (n, n):
            raise ValueError(
                f"Q has shape {np.asarray(self.Q).shape}; the model's "
                f"state dim is {n}"
            )
        if np.asarray(self.R).shape != (m, m):
            raise ValueError(
                f"R has shape {np.asarray(self.R).shape}; the model has "
                f"{m} control channel(s)"
            )
        A_seq, B_seq = self.model.linearize_f32(traj[:, :-1], u_phys)
        c_seq = (
            traj[:, 1:]
            - jnp.einsum("bkij,bkj->bki", A_seq, traj[:, :-1])
            - jnp.einsum("bkij,bkj->bki", B_seq, u_phys)
        )
        B_lane = B_seq * s                                    # (B, T, n, m)
        return A_seq, B_lane, c_seq

    def _condense_allpairs(self, A_seq: Array, B_lane: Array,
                           c_seq: Array, x0_f: Array):
        """Closed-form condensation — no propagator tensor, no recursion.

        Motivation: the sequential form S[k] = A_k S[k-1] + e_k B_k is T
        dependent steps and dominates the SQP outer iteration (88% at
        T=32, B=4096; BENCH_full.json device_sqp_phases, round 1).  This
        path removes the recursion — but measured on chip it is 5x
        SLOWER end to end than the scan (152.6 vs 30.6 ms/outer): its
        tiny-contraction (K=n) einsums and the (B,T,m,T,m) intermediate
        lower poorly on the MXU, losing far more than the log-depth
        gains.  Kept as the numerical cross-check; ``propagate="scan"``
        is the default.

        With prefix products P_k = A_k···A_0 (log-depth
        `associative_scan`), their inverses (from per-step Gauss-Jordan
        inverses, exact for the well-conditioned one-step discretizations
        A_k = I + O(dt)), W_j = P_j^{-1} B_j, and the suffix sums

            M'_j = sum_{k>=j} P_k^T Q P_k  +  P_{T-1}^T (Qf-Q) P_{T-1}
            r_j  = sum_{k>=j} P_k^T Q Cx_k +  P_{T-1}^T (Qf-Q) Cx_{T-1}

        every condensed block is a closed form in (B,T,n,n)-sized pieces:

            H[j1,j2] = W_{j1}^T M'_{max(j1,j2)} W_{j2}   (+ R_kron diag)
            G[j]     = (M'_j W_j)^T = Y_j^T              (free transpose)
            g        = G x0 + [W_j^T r_j]_j

        The only Tm x Tm object materialized is H itself: one upper-
        triangle einsum W_p^T Y_q (p<=q) plus its transpose.  Agreement
        with the scan path is f32-roundoff-level
        (tests/test_device_sqp.py::test_propagate_paths_agree).
        """
        T, m = self.horizon, self.n_ctrl
        n = A_seq.shape[-1]
        Q = jnp.asarray(self.Q, jnp.float32)
        Qf = jnp.asarray(self._Qf, jnp.float32)
        R_lane_np = (
            self._lane_scales[:, None]
            * np.asarray(self.R)
            * self._lane_scales[None, :]
        )
        R_kron = jnp.asarray(np.kron(np.eye(T), R_lane_np), jnp.float32)
        x_ref = np.broadcast_to(
            np.asarray(self.x_ref, np.float64), (T, n)
        )
        x_ref = jnp.asarray(x_ref, jnp.float32)

        # prefix products P_k = A_k ... A_0 and their inverses, (B,T,n,n);
        # combine(earlier x, later y) applies x first -> y @ x
        P = jax.lax.associative_scan(
            lambda x, y: y @ x, A_seq, axis=1
        )
        Ainv = _inv_unrolled(A_seq)
        Pinv = jax.lax.associative_scan(
            lambda x, y: x @ y, Ainv, axis=1
        )
        W = Pinv @ B_lane                                    # (B, T, n, m)

        # Cx_k = Cbar_k - x_ref = P_k cumsum_j(Pinv_j c_j) - x_ref
        v = jnp.einsum("bjin,bjn->bji", Pinv, c_seq)
        Cbar = jnp.einsum("bkin,bkn->bki", P, jnp.cumsum(v, axis=1))
        Cx = Cbar - x_ref[None, :, :]                        # (B, T, n)

        QP = jnp.einsum("ij,bkjq->bkiq", Q, P)               # (B,T,n,n)
        E = jnp.einsum("bkiq,bkir->bkqr", QP, P)             # P_k^T Q P_k
        PT = P[:, T - 1]
        FT = jnp.einsum("biq,ij,bjr->bqr", PT, Qf - Q, PT)   # terminal
        # suffix sums: M'_j = sum_{k>=j} E_k + FT
        Mp = jnp.flip(
            jnp.cumsum(jnp.flip(E, axis=1), axis=1), axis=1
        ) + FT[:, None]
        d = jnp.einsum("bkiq,bki->bkq", QP, Cx)              # P_k^T Q Cx_k
        r = jnp.flip(jnp.cumsum(jnp.flip(d, axis=1), axis=1), axis=1)
        r = r + jnp.einsum(
            "biq,ij,bj->bq", PT, Qf - Q, Cx[:, T - 1]
        )[:, None]

        Y = Mp @ W                                           # (B, T, n, m)
        # upper triangle (j1 <= j2): W_{j1}^T Y_{j2}
        U = jnp.einsum("bpni,bqnj->bpiqj", W, Y)             # (B,T,m,T,m)
        mask = (
            jnp.arange(T)[:, None] <= jnp.arange(T)[None, :]
        ).astype(U.dtype)
        U = U * mask[None, :, None, :, None]
        U = U.reshape(-1, T * m, T * m)
        D = jnp.einsum("bpni,bpnj->bpij", W, Y)              # diag blocks
        H = U + jnp.swapaxes(U, 1, 2) - _block_diag(D) + R_kron
        G = jnp.swapaxes(Y, 2, 3)                            # (B,T,m,n)
        g_x0 = jnp.einsum(
            "bpmq,bq->bpm", G, x0_f.astype(jnp.float32)
        )
        g_ref = jnp.einsum("bpni,bpn->bpi", W, r)
        g = (g_x0 + g_ref).reshape(-1, T * m)
        return H, g

    def _propagate_scan(self, A_seq: Array, B_lane: Array, c_seq: Array):
        """Forward recursion in a tile-friendly layout: batch LAST.

        The naive layout -- carries/stacks shaped (B, n, Tm) with the
        batch leading -- puts the tiny (n, Tm) = (3, 64) dims in the
        trailing two positions, which the TPU pads to (8, 128) vector
        tiles: 4.3x wasted bandwidth on every loop-carried buffer, and
        the batched (n x n)@(n x Tm) matmuls lower as padded tiny MXU
        ops.  Measured at T=32 B=4096: 30.4 ms per propagate.

        This version keeps everything (n, ..., B): the trailing dims are
        (Tm, B) = (64, 4096) -- exact multiples of the (8, 128) tile, so
        zero padding -- the matmuls become n-term broadcast FMAs on the
        VPU, and the per-step column insertion is a precomputed injection
        slice (no dynamic_update_slice in the loop body).  Measured:
        0.90 ms, a 34x speedup, which moves the whole-solve rate from
        26.4K to >100K solves/s (bench_device_sqp).

        Returns time-first stacks (Abar (T,n,n,B), Bbar_all (T,n,Tm,B),
        Cbar (T,n,B)) consumed by :meth:`_reduce_phase` in the same
        layout.
        """
        T, m = self.horizon, self.n_ctrl
        Tm = self.n_dec
        n = A_seq.shape[-1]

        At = jnp.transpose(A_seq, (1, 2, 3, 0))             # (T,n,n,B)
        ct = jnp.transpose(c_seq, (1, 2, 0))                # (T,n,B)
        # injection slices: Binj[k, i, k*m+l, b] = B_lane[b, k, i, l]
        eyeT = jnp.eye(T, dtype=jnp.float32)
        Binj = jnp.einsum("bkil,kq->kiqlb", B_lane, eyeT).reshape(
            T, n, Tm, -1
        )

        def body(carry, inp):
            P, S, c = carry                      # (n,n,B),(n,Tm,B),(n,B)
            Ak, Ik, ck = inp
            P = jnp.sum(Ak[:, :, None, :] * P[None, :, :, :], axis=1)
            S = jnp.sum(Ak[:, :, None, :] * S[None, :, :, :], axis=1) + Ik
            c = jnp.sum(Ak * c[None, :, :], axis=1) + ck
            return (P, S, c), (P, S, c)

        # derive the scan init from the (possibly device-varying) input so
        # carry-in and carry-out agree under shard_map's varying-axes check
        zero_b = (At[0, 0, 0] * 0.0).astype(jnp.float32)     # (B,)
        init = (
            jnp.eye(n, dtype=jnp.float32)[:, :, None] + zero_b,
            jnp.zeros((n, Tm, 1), jnp.float32) + zero_b,
            jnp.zeros((n, 1), jnp.float32) + zero_b,
        )
        _, (Abar, Bbar_all, Cbar) = jax.lax.scan(body, init, (At, Binj, ct))
        # stacked time-first, batch-last: (T, n, ..., B)
        return Abar, Bbar_all, Cbar

    def _propagate_unrolled(self, A_seq: Array, B_lane: Array,
                            c_seq: Array):
        """``propagate="unroll"``: the same recursion as
        :meth:`_propagate_scan` as a fully unrolled python loop with
        static slice injection.

        Skips the materialized (T, n, Tm, B) injection tensor entirely
        (a ~100 MB write + read of mostly zeros at the headline config):
        step k's control block enters via a static ``.at[:, k*m:(k+1)*m]
        .add`` instead.  Same stacks, f32-roundoff-identical
        (tests/test_device_sqp.py::test_propagate_unroll_agrees).
        Measured on chip: 1.8x faster than the scan in isolation (0.45
        vs 0.82 ms at T=32) but 27% SLOWER end to end inside the full
        solver (177.7K vs 243.5K solves/s, EXP_CONDENSE.json) -- the
        unrolled chain's separate intermediates and the final stack
        copies defeat the fusion/scheduling the scan form gets; kept as
        a measured cross-check, scan stays the default.
        """
        T, m = self.horizon, self.n_ctrl
        Tm = self.n_dec
        n = A_seq.shape[-1]
        At = jnp.transpose(A_seq, (1, 2, 3, 0))             # (T,n,n,B)
        Bt = jnp.transpose(B_lane, (1, 2, 3, 0))            # (T,n,m,B)
        ct = jnp.transpose(c_seq, (1, 2, 0))                # (T,n,B)
        zero_b = (At[0, 0, 0] * 0.0).astype(jnp.float32)    # (B,)
        P = jnp.eye(n, dtype=jnp.float32)[:, :, None] + zero_b
        S = jnp.zeros((n, Tm, 1), jnp.float32) + zero_b
        c = jnp.zeros((n, 1), jnp.float32) + zero_b
        Ps, Ss, cs = [], [], []
        for k in range(T):
            Ak = At[k]
            P = jnp.sum(Ak[:, :, None, :] * P[None, :, :, :], axis=1)
            S = jnp.sum(Ak[:, :, None, :] * S[None, :, :, :], axis=1)
            S = S.at[:, k * m : (k + 1) * m, :].add(Bt[k])
            c = jnp.sum(Ak * c[None, :, :], axis=1) + ct[k]
            Ps.append(P)
            Ss.append(S)
            cs.append(c)
        return jnp.stack(Ps), jnp.stack(Ss), jnp.stack(cs)

    def _reduce_consts(self):
        """Shared reduce-phase constants: (Q, Qf, R_kron, x_ref) as f32
        jnp values (both contraction forms consume exactly these)."""
        T = self.horizon
        Q = jnp.asarray(self.Q, jnp.float32)
        Qf = jnp.asarray(self._Qf, jnp.float32)
        R_lane_np = (
            self._lane_scales[:, None]
            * np.asarray(self.R)
            * self._lane_scales[None, :]
        )
        R_kron = jnp.asarray(np.kron(np.eye(T), R_lane_np), jnp.float32)
        x_ref = np.broadcast_to(
            np.asarray(self.x_ref, np.float64),
            (T, np.asarray(self.Q).shape[0]),
        )
        return Q, Qf, R_kron, jnp.asarray(x_ref, jnp.float32)

    def _reduce_linear(self, BQ, BQT, Abar, Cx, x0_f):
        """Shared linear-term epilogue: g = G x0 + g_ref from the
        weighted stacks (n-contractions, identical in both reduce
        forms)."""
        T = self.horizon
        G = jnp.einsum("kjnb,kjqb->bnq", BQ, Abar)
        G = G + jnp.einsum("jnb,jqb->bnq", BQT, Abar[T - 1])
        g_ref = jnp.einsum("kjnb,kjb->bn", BQ, Cx)
        g_ref = g_ref + jnp.einsum("jnb,jb->bn", BQT, Cx[T - 1])
        return jnp.einsum("bnq,bq->bn", G, x0_f.astype(jnp.float32)) + g_ref

    def _reduce_phase(
        self, Abar: Array, Bbar_all: Array, Cbar: Array, x0_f: Array
    ):
        """MXU einsum contractions: condensed Hessian Ht (Tm,Tm,B) and
        linear term g (B,Tm).

        Consumes the batch-last stacks of :meth:`_propagate_scan`
        (Abar (T,n,n,B), Bbar_all (T,n,Tm,B), Cbar (T,n,B)) and KEEPS the
        Hessian batch-last: (Tm,Tm,B) trailing tiles are (64, B) --
        unpadded -- where (B,Tm,Tm) would pad the 64-lane dim to 128 and
        double the traffic of every downstream pass (power iteration
        reads H 16x).  The one consumer needing (B,Tm,Tm) -- the PGD's
        int8 MXU matmul -- gets a single transposed int8 copy from
        :meth:`_quantize_phase`."""
        T = self.horizon
        Q, Qf, R_kron, x_ref = self._reduce_consts()
        Cx = Cbar - x_ref[:, :, None]                         # (T, n, B)

        BQ = jnp.einsum("kinb,ij->kjnb", Bbar_all, Q)
        BT = Bbar_all[T - 1]
        BQT = jnp.einsum("inb,ij->jnb", BT, Qf - Q)
        Ht = jnp.einsum("kjnb,kjmb->nmb", BQ, Bbar_all)
        Ht = Ht + jnp.einsum("jnb,jmb->nmb", BQT, BT)
        Ht = Ht + R_kron[:, :, None]
        g = self._reduce_linear(BQ, BQT, Abar, Cx, x0_f)
        return Ht, g

    def _reduce_blocked(
        self, Abar: Array, Bbar_all: Array, Cbar: Array, x0_f: Array
    ):
        """``reduce="blocked"`` contraction (see the field docstring):
        2x2 block-triangular Ht with the symmetric mirror; the linear
        term reuses :meth:`_reduce_linear` (n-contractions, not the hot
        part)."""
        T, m = self.horizon, self.n_ctrl
        Tm = self.n_dec
        Th = T // 2
        h = Th * m
        Q, Qf, R_kron, x_ref = self._reduce_consts()
        Cx = Cbar - x_ref[:, :, None]                         # (T, n, B)

        BQ = jnp.einsum("kinb,ij->kjnb", Bbar_all, Q)
        BT = Bbar_all[T - 1]
        BQT = jnp.einsum("inb,ij->jnb", BT, Qf - Q)
        lo = slice(0, h)
        hi = slice(h, Tm)
        H_ll = jnp.einsum(
            "kjnb,kjmb->nmb", BQ[:, :, lo], Bbar_all[:, :, lo]
        ) + jnp.einsum("jnb,jmb->nmb", BQT[:, lo], BT[:, lo])
        H_lh = jnp.einsum(
            "kjnb,kjmb->nmb", BQ[Th:, :, lo], Bbar_all[Th:, :, hi]
        ) + jnp.einsum("jnb,jmb->nmb", BQT[:, lo], BT[:, hi])
        H_hh = jnp.einsum(
            "kjnb,kjmb->nmb", BQ[Th:, :, hi], Bbar_all[Th:, :, hi]
        ) + jnp.einsum("jnb,jmb->nmb", BQT[:, hi], BT[:, hi])
        top = jnp.concatenate([H_ll, H_lh], axis=1)
        bot = jnp.concatenate([jnp.swapaxes(H_lh, 0, 1), H_hh], axis=1)
        Ht = jnp.concatenate([top, bot], axis=0) + R_kron[:, :, None]
        g = self._reduce_linear(BQ, BQT, Abar, Cx, x0_f)
        return Ht, g

    def _reduce_btrans(
        self, Abar: Array, Bbar_all: Array, Cbar: Array, x0_f: Array
    ):
        """``reduce="btrans"`` contraction: explicitly transpose the
        weighted stacks to batch-LEADING (B, T*n, Tm), contract as one
        clean batched GEMM, and transpose Ht back to batch-last for the
        lipschitz/quantize stages.  Probes whether XLA's handling of the
        batch-trailing einsum (which must relayout internally) loses to
        paying the two 100/67 MB transposes explicitly."""
        T = self.horizon
        Tm = self.n_dec
        Q, Qf, R_kron, x_ref = self._reduce_consts()
        Cx = Cbar - x_ref[:, :, None]                         # (T, n, B)

        BQ = jnp.einsum("kinb,ij->kjnb", Bbar_all, Q)
        BT = Bbar_all[T - 1]
        BQT = jnp.einsum("inb,ij->jnb", BT, Qf - Q)
        n = Bbar_all.shape[1]
        Al = jnp.transpose(BQ.reshape(T * n, Tm, -1), (2, 0, 1))
        Bl = jnp.transpose(Bbar_all.reshape(T * n, Tm, -1), (2, 0, 1))
        Hb = jnp.einsum("bkn,bkm->bnm", Al, Bl)               # (B,Tm,Tm)
        Hb = Hb + jnp.einsum(
            "bjn,bjm->bnm",
            jnp.transpose(BQT, (2, 0, 1)),
            jnp.transpose(BT, (2, 0, 1)),
        )
        Ht = jnp.transpose(Hb, (1, 2, 0)) + R_kron[:, :, None]
        g = self._reduce_linear(BQ, BQT, Abar, Cx, x0_f)
        return Ht, g

    @functools.cached_property
    def _Q_sqrt(self) -> np.ndarray:
        """PSD square root L of Q (Q = L L^T) for ``reduce="sym"``,
        via eigh so merely-semidefinite Q (zero state weights) works."""
        Qn = np.asarray(self.Q, np.float64)
        w, V = np.linalg.eigh((Qn + Qn.T) / 2.0)
        if w.min() < -1e-9 * max(1.0, w.max()):
            raise ValueError(
                f"reduce='sym' (the default) needs Q PSD; eigenvalues "
                f"{w}. For an indefinite Q use reduce='einsum'."
            )
        return V * np.sqrt(np.clip(w, 0.0, None))

    def _reduce_sym(
        self, Abar: Array, Bbar_all: Array, Cbar: Array, x0_f: Array
    ):
        """``reduce="sym"`` contraction: Ht via the symmetric square
        ``W^T W`` with ``W = (L^T B-stack)`` and ``Q = L L^T``.

        Motivation is OBSERVED, not inferred (EXP_REDUCE_TRACE.json,
        round 5): the profiler shows ~1.45 ms/outer of the einsum path's
        3.3 ms condensation is `copy.*`/`reshape` HLO ops -- bf16 hi/lo
        operand splits + tile relayouts XLA materializes to feed the
        3-pass f32 MXU dot (one split pair per DISTINCT operand), plus
        the f32 Ht result relayout.  Contracting ``W`` against ITSELF
        halves the operand-split traffic: one (T, n, Tm, B) stack
        (``W``) materializes instead of two (``BQ`` and ``Bbar`` both
        feeding the dot), and the linear term's n-contractions run on
        L-weighted small tensors.  The terminal ``Qf - Q`` term (not
        necessarily PSD) stays in the two-operand form -- it is one
        (n, Tm, B) slab, not T of them.  Agreement with the einsum path
        is f32-roundoff-level (tests/test_device_sqp.py).
        """
        T = self.horizon
        Q, Qf, R_kron, x_ref = self._reduce_consts()
        Cx = Cbar - x_ref[:, :, None]                         # (T, n, B)
        Lj = jnp.asarray(self._Q_sqrt, jnp.float32)           # (n, n)

        W = jnp.einsum("kinb,il->klnb", Bbar_all, Lj)         # (T,n,Tm,B)
        Ht = jnp.einsum("klnb,klmb->nmb", W, W)
        BT = Bbar_all[T - 1]
        BQT = jnp.einsum("inb,ij->jnb", BT, Qf - Q)
        Ht = Ht + jnp.einsum("jnb,jmb->nmb", BQT, BT)
        Ht = Ht + R_kron[:, :, None]

        LA = jnp.einsum("kjqb,jl->klqb", Abar, Lj)            # (T,n,n,B)
        LCx = jnp.einsum("kjb,jl->klb", Cx, Lj)               # (T,n,B)
        G = jnp.einsum("klnb,klqb->bnq", W, LA)
        G = G + jnp.einsum("jnb,jqb->bnq", BQT, Abar[T - 1])
        g_ref = jnp.einsum("klnb,klb->bn", W, LCx)
        g_ref = g_ref + jnp.einsum("jnb,jb->bn", BQT, Cx[T - 1])
        g = jnp.einsum(
            "bnq,bq->bn", G, x0_f.astype(jnp.float32)
        ) + g_ref
        return Ht, g

    def _lipschitz_phase(self, Ht: Array) -> Array:
        """Power iteration for lambda_max(H) (PSD), 1.05 safety factor.

        Operates on the batch-last Hessian Ht (Tm,Tm,B): each of the
        ``power_iters`` matvecs streams H exactly once with zero tile
        padding (a (B,Tm,Tm) layout pads the trailing 64-lane dim to 128
        and doubles the traffic of the dominant per-outer loop)."""
        Tm = self.n_dec

        def pit(_, v):                                        # v (Tm, B)
            w = jnp.sum(Ht * v[None, :, :], axis=1)
            return w / (
                jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True)) + 1e-30
            )

        zero_b = (Ht[0, 0] * 0.0).astype(jnp.float32)         # (B,)
        v0 = (
            jnp.full((Tm, 1), 1.0 / np.sqrt(Tm), jnp.float32)
            + zero_b
        )
        v = jax.lax.fori_loop(0, self.power_iters, pit, v0)
        hv = jnp.sum(Ht * v[None, :, :], axis=1)
        return jnp.sum(v * hv, axis=0) * np.float32(1.05)

    def _condense_dev(self, x0_f: Array, lanes: Array):
        """f32 linearize + condense + quantize, fully traced.

        x0_f (B, n) f32; lanes (B, Tm) int32.  Returns (Hq int8, g_pre
        int32, hs_num int32, hs_den int32) with Tp == Tm (no padding: the
        packing constraint already makes Tm a multiple of 4).

        The f32 reduction outputs (Ht, g, lip) pass through
        ``optimization_barrier`` before quantization, and the quantized
        operands through another before the inner consumes them: without
        the barriers XLA compiles the condensation differently around a
        Pallas inner (custom call) than around the XLA fori_loop inner --
        different fusion/reduction tiling, last-ulp f32 deltas -- and
        quantization ties land on adjacent roundings (measured 80/4096
        problems at the headline config before the fix,
        exp_fused_pgd_diff.py).  The barriers pin the reduction subgraph's
        boundary so both inner paths quantize bit-identical operands.
        """
        Ht, g = self._condense_ht(x0_f, lanes)
        Ht, g = jax.lax.optimization_barrier((Ht, g))
        lip = jax.lax.optimization_barrier(self._lipschitz_phase(Ht))
        return jax.lax.optimization_barrier(
            self._quantize_phase(Ht, g, lip)
        )

    def _propagate_mode(self) -> str:
        """``propagate`` with "auto" resolved by the measured horizon
        crossover (EXP_PROP.json): "unroll" from T=24 up, "scan" below.
        """
        if self.propagate != "auto":
            return self.propagate
        return "unroll" if self.horizon >= 24 else "scan"

    def _condense_ht(self, x0_f: Array, lanes: Array):
        """Condensed (Ht (Tm,Tm,B), g (B,Tm)) via the configured
        ``propagate`` path (f32) -- Hessian batch-last, the internal
        layout of the lipschitz/quantize stages."""
        A_seq, B_lane, c_seq = self._linearize_phase(x0_f, lanes)
        if self.propagate == "allpairs":
            H, g = self._condense_allpairs(A_seq, B_lane, c_seq, x0_f)
            return jnp.transpose(H, (1, 2, 0)), g
        prop = (
            self._propagate_unrolled
            if self._propagate_mode() == "unroll"
            else self._propagate_scan
        )
        Abar, Bbar_all, Cbar = prop(A_seq, B_lane, c_seq)
        red = {
            "einsum": self._reduce_phase,
            "blocked": self._reduce_blocked,
            "btrans": self._reduce_btrans,
            "sym": self._reduce_sym,
        }[self.reduce]
        return red(Abar, Bbar_all, Cbar, x0_f)

    def _condense_hg(self, x0_f: Array, lanes: Array):
        """Condensed (H (B,Tm,Tm), g (B,Tm)) via the configured
        ``propagate`` path (f32) -- the batch-first public layout (one
        transpose off the internal batch-last form)."""
        Ht, g = self._condense_ht(x0_f, lanes)
        return jnp.transpose(Ht, (2, 0, 1)), g

    def _g_pre_from(self, g: Array, alpha: Array) -> Array:
        """int32 pre-shift linear term from f32 g (B, Tm) and the per-
        problem step alpha.  Mirrors the host path's corrupted-input
        guard (QuantizedQP.g_lane_fixed): non-finite linear terms
        saturate / zero instead of tracing NaN into the int32
        conversion."""
        gs = jnp.nan_to_num(
            g * (alpha * np.float32(2.0**self.g_shift))[:, None],
            nan=0.0, posinf=2.0**31 - 1, neginf=-(2.0**31),
        )
        return jnp.clip(
            jnp.round(gs), -(2.0**31), 2.0**31 - 1
        ).astype(jnp.int32)

    def _step_rationals(self, h_scale: Array):
        """int32 rational num/2**den ~ 1/h_scale pre-shift step (same
        formulas as mpc.condensed.quantize, u_scale=1)."""
        Tm = self.n_dec
        val = h_scale * np.float32(2.0**self.g_shift)
        num_max = np.float32((2**31 - 1) // (127 * 127 * Tm))
        hs_den = jnp.clip(
            jnp.floor(jnp.log2(num_max / val)), 0, 31
        ).astype(jnp.int32)
        hs_num = jnp.round(val * jnp.exp2(hs_den.astype(jnp.float32))).astype(
            jnp.int32
        )
        return hs_num, hs_den

    def _quantize_phase(self, Ht: Array, g: Array, lip: Array):
        """int8 Hessian + int32 step rationals (same formulas as
        mpc.condensed.quantize, u_scale=1).  Consumes the batch-last Ht
        (Tm,Tm,B); the elementwise math is layout-invariant, and the one
        transpose to the PGD's (B,Tm,Tm) happens on the int8 result (4x
        smaller than transposing the f32 H)."""
        alpha = 1.0 / lip                                     # (B,)
        # alpha cancels out of Hq (round(alpha H / (alpha max|H| / 127))
        # == round(127 H / max|H|)), so quantize straight from Ht: one
        # abs-max reduce + one scale pass instead of materializing
        # alpha*H (a full (Tm,Tm,B) write + re-read) first
        h_max = jnp.max(jnp.abs(Ht), axis=(0, 1))             # (B,)
        h_scale = alpha * h_max / 127.0
        Hq = jnp.transpose(
            jnp.clip(
                jnp.round(Ht * (127.0 / h_max)[None, None, :]), -127, 127
            ).astype(jnp.int8),
            (2, 0, 1),
        )
        g_pre = self._g_pre_from(g, alpha)
        hs_num, hs_den = self._step_rationals(h_scale)
        return Hq, g_pre, hs_num, hs_den

    def _condense_lipq(self, x0_f: Array, lanes: Array):
        """lipq-kernel condensation (``lipq=True`` path): f32 linearize +
        condense, then the VMEM-resident lipschitz+quantize kernel.

        Returns (hqt (Tm,Tm,B) int8 in the fused inner's orientation,
        g_pre (B,Tm) int32, hs_num, hs_den).  The XLA inner consumes the
        exact int8 transpose ``jnp.transpose(hqt, (2, 1, 0))``.
        """
        from pint_tpu.mpc.condense_fused import lipq_fused

        Ht, g = self._condense_ht(x0_f, lanes)
        Ht, g = jax.lax.optimization_barrier((Ht, g))
        hqt, lip, h_max = lipq_fused(
            Ht, power_iters=self.power_iters, block=self.lipq_block
        )
        alpha = 1.0 / lip
        h_scale = alpha * h_max / 127.0
        g_pre = self._g_pre_from(g, alpha)
        hs_num, hs_den = self._step_rationals(h_scale)
        return jax.lax.optimization_barrier((hqt, g_pre, hs_num, hs_den))

    # -- public API ---------------------------------------------------------------

    def _auto(self, flag: "bool | None") -> bool:
        from pint_tpu.mpc.fused_alm import on_tpu_backend

        return flag if flag is not None else on_tpu_backend()

    def _use_fused(self) -> bool:
        """fused flag resolved AND geometry-gated AND (on auto)
        determinism-gated.

        Geometry: horizons whose int8 Hessian slab cannot fit physical
        VMEM at the minimum native block fall back to the XLA inner
        (graceful long-horizon degradation).

        Determinism: on ``fused=None`` auto-selection the kernel inner
        additionally requires :meth:`_use_lipq` -- the lipq kernel is
        what carries the fused-vs-XLA full-solve bit-identity (all
        quantization rounding inside one Pallas kernel, EXP_R4.json
        0/4096).  Without it the condensation compiles differently
        around a custom-call inner than around the XLA fori_loop inner
        and quantization ties flip (measured 80/4096).  So the
        potentially-divergent combination (kernel inner, XLA quantize)
        is reachable only by EXPLICIT ``fused=True, lipq=False`` -- never
        silently (docs/DESIGN.md determinism contract)."""
        from pint_tpu.mpc.fused_alm import pgd_viable

        if not pgd_viable(self.n_dec):
            return False
        if self.fused is not None:
            return self.fused
        return self._auto(None) and self._use_lipq()

    def _use_lipq(self) -> bool:
        from pint_tpu.mpc.condense_fused import lipq_viable

        return self._auto(self.lipq) and lipq_viable(self.n_dec)

    def _run_inner(self, use_fused, use_lipq, words, x0_f, lanes):
        """Condense (lipq kernel or XLA epilogue) + one full-column PGD
        inner, in all four flag combinations -- the shared body of
        :meth:`solve_words` and the tp == 1 sharded path.  All four
        combinations are bit-identical given the same quantized operands
        (tests/test_condense_fused.py)."""
        if use_lipq:
            hqt, g_pre, hs_num, hs_den = self._condense_lipq(x0_f, lanes)
            if use_fused:
                from pint_tpu.mpc.fused_alm import pgd_fused_words_pre

                return pgd_fused_words_pre(
                    words, g_pre, hqt, hs_num, hs_den,
                    iters=self.pgd_iters, g_shift=self.g_shift,
                    block=self.fused_block,
                )
            Hq = jnp.transpose(hqt, (2, 1, 0))
        else:
            Hq, g_pre, hs_num, hs_den = self._condense_dev(x0_f, lanes)
            if use_fused:
                from pint_tpu.mpc.fused_alm import pgd_fused_words

                return pgd_fused_words(
                    words, g_pre, Hq, hs_num, hs_den,
                    iters=self.pgd_iters, g_shift=self.g_shift,
                    block=self.fused_block,
                )
        return _pgd_batched_h(
            words, g_pre, Hq, hs_num, hs_den,
            iters=self.pgd_iters, g_shift=self.g_shift,
        )

    @functools.cached_property
    def _solve_jit(self):
        def solve(u_words: Array, x0_f: Array) -> Array:
            use_fused = self._use_fused()
            use_lipq = self._use_lipq()

            def outer(_, words):
                lanes = unpack_controls(words)[:, : self.n_dec]
                return self._run_inner(
                    use_fused, use_lipq, words, x0_f, lanes
                )

            return jax.lax.fori_loop(0, self.sqp_iters, outer, u_words)

        return jax.jit(solve)

    def solve_words(self, u_words: Array, x0_f: Array) -> Array:
        """``sqp_iters`` on-device SQP iterations.  x0_f (B, n) float32
        physical state; u_words (B, Tm/4) packed int8 plan (warm start).
        One XLA program; vmap/shard_map friendly."""
        return self._solve_jit(u_words, jnp.asarray(x0_f, jnp.float32))

    @functools.cached_property
    def _sharded_cache(self) -> dict:
        return {}

    @staticmethod
    def _mesh_key(mesh):
        # the backend is part of the key: the baked-in use_fused/use_lipq
        # resolution depends on jax.default_backend() at first-call time,
        # and the platform can legitimately change within a process (the
        # CLAUDE.md jax.config.update("jax_platforms", "cpu") pattern)
        return (
            jax.default_backend(),
            tuple(mesh.shape.items()),
            tuple(d.id for d in mesh.devices.flat),
        )

    def sharded_solve_words(self, mesh):
        """dp x tp sharded solve: jitted (u_words (B, Tm/4) P('dp','tp'),
        x0_f (B, n) P('dp', None)) -> words P('dp','tp').

        **dp** shards problems (the loop is batch-parallel).  **tp**
        shards the PGD stage's horizon columns: per inner iteration each
        rank contributes ``U_r @ Hq[:, :, cols_r]^T`` to an exact int32
        psum of the full gradient (the BASELINE.json "condensed-QP blocks
        reduced via psum" path) and updates only its columns.  Per SQP
        outer iteration one int32 all_gather rebuilds the full lane plan
        for the rollout, and the f32 condensation runs tp-replicated (its
        inputs are identical on every tp rank, so its outputs are too).
        On dp-major meshes (tp == 1) the inner honors ``fused``: each
        shard's solves are independent, so the VMEM-resident Pallas
        kernel runs per shard and a multi-chip deployment gets the same
        per-chip rate as :meth:`solve_words` (fused-sharded bit-identity:
        tests/test_fused_alm.py).  On tp > 1 meshes ``fused`` selects
        the per-iteration-kernel column inner (psum between launches).
        Bit-identical to :meth:`solve_words`
        on every mesh shape (tests/test_device_sqp.py).  Programs are
        memoized per mesh (shape + device ids), so repeated calls with
        the same mesh return the same compiled callable.
        """
        from jax.sharding import PartitionSpec as P

        key = self._mesh_key(mesh)
        cached = self._sharded_cache.get(key)
        if cached is not None:
            return cached

        tp = mesh.shape["tp"]
        if self.n_dec % (4 * tp):
            raise ValueError(
                f"horizon*n_ctrl = {self.n_dec} must divide into 4-lane "
                f"words across tp={tp}"
            )
        block = self.n_dec // tp
        if tp == 1:
            use_fused = self._use_fused()
        else:
            # the tp>1 path's kernel is the per-rank matvec, whose slab
            # is a factor tp smaller than the one-launch kernel's --
            # gate on ITS footprint, not pgd_viable's (a horizon too big
            # for the one-launch kernel can still run the matvec kernel).
            # Auto-selection further requires the measured perf
            # crossover (matvec_wins: the 12-point sweep has the kernel
            # winning at every K >= 16 columns/rank, EXP_MATVEC_SWEEP)
            # AND the lipq determinism carrier, mirroring the tp == 1
            # rule; explicit fused=True forces the kernel where viable.
            from pint_tpu.mpc.fused_alm import resolve_tp_fused

            use_fused = resolve_tp_fused(
                self.fused, block, self.n_dec, self._use_lipq()
            )
        use_lipq = self._use_lipq()
        fused_tp1 = tp == 1 and use_fused

        def local(u_words: Array, x0_f: Array) -> Array:
            r = jax.lax.axis_index("tp")
            # the all_gathered lanes stay marked device-varying over tp, so
            # every value they meet in the condensation must be too -- mark
            # the (tp-replicated) state the same way or scan carries clash
            x0_f = jax.lax.pcast(x0_f, ("tp",), to="varying")

            def outer(_, words):
                lanes_r = unpack_controls(words)  # (B_loc, block)
                lanes = jax.lax.all_gather(
                    lanes_r, "tp", axis=1, tiled=True
                )  # (B_loc, Tm): exact int32 plan, tp-replicated
                if fused_tp1:  # whole-column fused inner per shard
                    return self._run_inner(
                        True, use_lipq, words, x0_f, lanes
                    )
                if use_lipq:
                    hqt, g_pre, hs_num, hs_den = self._condense_lipq(
                        x0_f, lanes
                    )
                elif use_fused:
                    Hq, g_pre, hs_num, hs_den = self._condense_dev(
                        x0_f, lanes
                    )
                    # exact int8 relayout into kernel orientation for
                    # the per-iteration matvec kernel
                    hqt = jnp.moveaxis(
                        jnp.transpose(Hq, (0, 2, 1)), 0, -1
                    )
                else:
                    Hq, g_pre, hs_num, hs_den = self._condense_dev(
                        x0_f, lanes
                    )
                g_r = jax.lax.dynamic_slice_in_dim(
                    g_pre, r * block, block, axis=1
                )
                if use_fused:
                    # tp-fused column inner: the matvec runs as one
                    # Pallas kernel per iteration with the exact int32
                    # psum BETWEEN launches (bit-identical to the XLA
                    # column path; 3.9x on the matvec per EXP_TP_FUSED)
                    return _pgd_batched_h_cols_hqt(
                        words, g_r, hqt, hs_num, hs_den,
                        iters=self.pgd_iters, g_shift=self.g_shift,
                        axis_name="tp", block=block,
                        kernel_block=self.fused_block,
                    )
                if use_lipq:
                    Hq = jnp.transpose(hqt, (2, 1, 0))
                return _pgd_batched_h_cols(
                    words, g_r, Hq, hs_num, hs_den,
                    iters=self.pgd_iters, g_shift=self.g_shift,
                    axis_name="tp", block=block,
                )

            return jax.lax.fori_loop(0, self.sqp_iters, outer, u_words)

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("dp", "tp"), P("dp", None)),
            out_specs=P("dp", "tp"),
            # Pallas kernels don't participate in varying-manual-axes
            # tracking (values computed inside a kernel lose their vma
            # tags, so kernel-internal loop carries can never type-check;
            # JAX's own error says to pass check_vma=False) -- disable
            # the static check when any kernel runs in the shard body,
            # keeping it as a safety net for the pure-XLA column path
            check_vma=not use_fused and not use_lipq,
        )
        out = jax.jit(
            lambda u, x0: fn(u, jnp.asarray(x0, jnp.float32))
        )
        self._sharded_cache[key] = out
        return out

    def solve(self, x0_f: np.ndarray):
        """Cold-start convenience: returns (words, physical plans)."""
        x0_f = np.atleast_2d(np.asarray(x0_f, np.float64))
        words = self.solve_words(
            self.init_words(x0_f.shape[0]), x0_f.astype(np.float32)
        )
        lanes = np.asarray(unpack_controls(words))[:, : self.n_dec]
        plans = (
            lanes.reshape(-1, self.horizon, self.n_ctrl) * self._lane_scales
        )
        return words, plans
