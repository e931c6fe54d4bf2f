"""Condensation-stage experiments on chip (round 4, VERDICT item 2).

The hg assembly (propagate scan + reduce einsums) is the binding stage
of both device solvers after the inner fusion + lipq kernels.  This
script times, at the headline geometry (B=4096, T=32) and at T=50:

1. phase split: linearize / propagate / reduce / lipq as separate
   chained programs,
2. propagate variants: lax.scan over the materialized injection tensor
   (current) vs a fully unrolled python loop with static slice
   injection (no (T,n,Tm,B) injection tensor, ~200 MB less traffic),
3. reduce variants: current two-einsum form, single fused einsum, and
   a 2x2 block-triangular + symmetric-mirror form that skips the
   structurally-zero half of the contraction (Bbar[k] columns beyond
   (k+1)m are zero) -- ~2x FLOPs saved on the dominant einsum.

Writes EXP_CONDENSE.json.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import time_chained, fetch_overhead, wait_device_ready
from pint_tpu.mpc import DeviceSQP

T0 = time.time()
note = lambda m: print(f"[cond {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {}
B = 4096
rng = np.random.default_rng(0)


def mk(T):
    return DeviceSQP(
        horizon=T, sqp_iters=4, pgd_iters=30,
        Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
        qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]),
    )


def propagate_unrolled(dev, A_seq, B_lane, c_seq):
    """Unrolled python-loop propagate: same stacks as _propagate_scan
    (time-first batch-last), no materialized injection tensor."""
    T, m = dev.horizon, dev.n_ctrl
    Tm = dev.n_dec
    n = A_seq.shape[-1]
    At = jnp.transpose(A_seq, (1, 2, 3, 0))             # (T,n,n,B)
    Bt = jnp.transpose(B_lane, (1, 2, 3, 0))            # (T,n,m,B)
    ct = jnp.transpose(c_seq, (1, 2, 0))                # (T,n,B)
    batch = At.shape[-1]
    P = jnp.broadcast_to(
        jnp.eye(n, dtype=jnp.float32)[:, :, None], (n, n, batch)
    )
    S = jnp.zeros((n, Tm, batch), jnp.float32)
    c = jnp.zeros((n, batch), jnp.float32)
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


def reduce_fusedein(dev, Abar, Bbar_all, Cbar, x0_f):
    """Single fused einsum for Ht (XLA chooses the contraction path)."""
    T = dev.horizon
    Q = jnp.asarray(dev.Q, jnp.float32)
    Qf = jnp.asarray(dev._Qf, jnp.float32)
    R_lane_np = (dev._lane_scales[:, None] * np.asarray(dev.R)
                 * dev._lane_scales[None, :])
    R_kron = jnp.asarray(np.kron(np.eye(T), R_lane_np), jnp.float32)
    Ht = jnp.einsum("kinb,ij,kjmb->nmb", Bbar_all, Q, Bbar_all)
    BT = Bbar_all[T - 1]
    Ht = Ht + jnp.einsum("inb,ij,jmb->nmb", BT, Qf - Q, BT)
    return Ht + R_kron[:, :, None]


def reduce_blocked(dev, Abar, Bbar_all, Cbar, x0_f):
    """2x2 block-triangular + symmetric mirror: columns >= h of Bbar[k]
    are zero for k < T//2, so those contraction halves are skipped; the
    lower-left block is the exact transpose copy of the upper-right
    (H is symmetric; the mirror makes it exactly so)."""
    T, m = dev.horizon, dev.n_ctrl
    Tm = dev.n_dec
    Th = T // 2
    h = Th * m
    Q = jnp.asarray(dev.Q, jnp.float32)
    Qf = jnp.asarray(dev._Qf, jnp.float32)
    R_lane_np = (dev._lane_scales[:, None] * np.asarray(dev.R)
                 * dev._lane_scales[None, :])
    R_kron = jnp.asarray(np.kron(np.eye(T), R_lane_np), jnp.float32)

    BQ = jnp.einsum("kinb,ij->kjnb", Bbar_all, Q)       # (T,n,Tm,B)
    lo = slice(0, h)
    hi = slice(h, Tm)
    H_ll = jnp.einsum(
        "kjnb,kjmb->nmb", BQ[:, :, lo], Bbar_all[:, :, lo]
    )
    H_lh = jnp.einsum(
        "kjnb,kjmb->nmb", BQ[Th:, :, lo], Bbar_all[Th:, :, hi]
    )
    H_hh = jnp.einsum(
        "kjnb,kjmb->nmb", BQ[Th:, :, hi], Bbar_all[Th:, :, hi]
    )
    BT = Bbar_all[T - 1]
    BQT = jnp.einsum("inb,ij->jnb", BT, Qf - Q)
    F_ll = jnp.einsum("jnb,jmb->nmb", BQT[:, lo], BT[:, lo])
    F_lh = jnp.einsum("jnb,jmb->nmb", BQT[:, lo], BT[:, hi])
    F_hh = jnp.einsum("jnb,jmb->nmb", BQT[:, hi], BT[:, hi])
    top = jnp.concatenate([H_ll + F_ll, H_lh + F_lh], axis=1)
    bot = jnp.concatenate(
        [jnp.swapaxes(H_lh + F_lh, 0, 1), H_hh + F_hh], axis=1
    )
    return jnp.concatenate([top, bot], axis=0) + R_kron[:, :, None]


def run_geom(T):
    dev = mk(T)
    tag = f"T{T}"
    Tm = dev.n_dec
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
    lanes = jnp.asarray(
        rng.integers(-100, 100, (B, Tm), dtype=np.int32))

    A_seq, B_lane, c_seq = jax.jit(dev._linearize_phase)(x0, lanes)
    Abar, Bbar, Cbar = jax.jit(dev._propagate_scan)(A_seq, B_lane, c_seq)
    jax.block_until_ready(Bbar)

    def t(label, fn, x0_arg, *consts, inner=32):
        # chain via a f32 carry perturbation; EVERY output element must
        # feed the carry (via means) or XLA dead-code-eliminates the
        # stage body -- the first version consumed only element [0] and
        # measured DCE'd fragments (T50 prop_scan "0.031 ms")
        def step(xc, *cs):
            r = fn(xc, *cs)
            acc = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                acc = acc + jnp.mean(leaf.astype(jnp.float32))
            return xc + acc * jnp.float32(1e-20)
        sec = time_chained(step, x0_arg, *consts, inner=inner, reps=5,
                          overhead=OVERHEAD)
        OUT[f"{tag}_{label}_ms"] = sec * 1e3
        note(f"{tag} {label}: {sec*1e3:.3f} ms")
        return sec

    # phase split
    t("linearize", lambda xc, l: dev._linearize_phase(xc, l), x0, lanes)
    t("prop_scan",
      lambda xc, a, bl, c: dev._propagate_scan(a + 0 * xc[0, 0], bl, c),
      x0, A_seq, B_lane, c_seq)
    t("prop_unroll",
      lambda xc, a, bl, c: dev._propagate_unrolled(
          a + 0 * xc[0, 0], bl, c),
      x0, A_seq, B_lane, c_seq, inner=16)
    t("reduce_cur",
      lambda xc, ab, bb, cb: dev._reduce_phase(
          ab + 0 * xc[0, 0], bb, cb, xc),
      x0, Abar, Bbar, Cbar)
    t("reduce_fusedein",
      lambda xc, ab, bb, cb: reduce_fusedein(
          dev, ab + 0 * xc[0, 0], bb, cb, xc),
      x0, Abar, Bbar, Cbar)
    t("reduce_blocked",
      lambda xc, ab, bb, cb: dev._reduce_blocked(
          ab + 0 * xc[0, 0], bb, cb, xc),
      x0, Abar, Bbar, Cbar)

    # numeric agreement of the variants (roundoff-level)
    Ht_cur, g = jax.jit(dev._reduce_phase)(Abar, Bbar, Cbar, x0)
    Ht_fe = jax.jit(
        lambda a, b, c, x: reduce_fusedein(dev, a, b, c, x)
    )(Abar, Bbar, Cbar, x0)
    Ht_bl, _ = jax.jit(dev._reduce_blocked)(Abar, Bbar, Cbar, x0)
    scale = float(jnp.max(jnp.abs(Ht_cur)))
    OUT[f"{tag}_fusedein_rel"] = float(
        jnp.max(jnp.abs(Ht_fe - Ht_cur)) / scale)
    OUT[f"{tag}_blocked_rel"] = float(
        jnp.max(jnp.abs(Ht_bl - Ht_cur)) / scale)
    # unrolled propagate agreement
    Au, Bu, Cu = jax.jit(dev._propagate_unrolled)(A_seq, B_lane, c_seq)
    OUT[f"{tag}_unroll_rel"] = float(
        jnp.max(jnp.abs(Bu - Bbar)) / float(jnp.max(jnp.abs(Bbar))))

    # lipq timing for reference
    from pint_tpu.mpc.condense_fused import lipq_fused
    t("lipq",
      lambda xc, H: lipq_fused(
          H + 0 * xc[0, 0], power_iters=dev.power_iters, block=128),
      x0, Ht_cur, inner=16)
    t("xla_lip_quant",
      lambda xc, H: dev._quantize_phase(
          H + 0 * xc[0, 0],
          jnp.zeros((B, Tm), jnp.float32),
          dev._lipschitz_phase(H + 0 * xc[0, 0])),
      x0, Ht_cur, inner=16)


def run_full(T):
    """Full-solver rates for the variant combos at B=4096 (the decision
    metric; phase timings above are diagnostic)."""
    import dataclasses

    base = mk(T)
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
    u0 = base.init_words(B)
    for name, kw in [
        ("default", {}),
        ("blocked", dict(reduce="blocked")),
        ("unroll", dict(propagate="unroll")),
        ("unroll_blocked", dict(propagate="unroll", reduce="blocked")),
    ]:
        d = dataclasses.replace(base, **kw)
        sec = time_chained(
            lambda w, x, dd=d: dd._solve_jit(w, x), u0, x0,
            inner=32, reps=5, overhead=OVERHEAD)
        OUT[f"T{T}_solver_{name}_per_s"] = B / sec
        note(f"T{T} solver {name}: {B/sec:,.0f} solves/s")


run_geom(32)
run_geom(50)
run_full(32)
run_full(50)
with open("EXP_CONDENSE.json", "w") as f:
    json.dump(OUT, f, indent=2)
note("wrote EXP_CONDENSE.json")
print(json.dumps(OUT))
