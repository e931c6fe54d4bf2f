"""Phase attribution + fused-forward experiment for DeviceConstrainedSQP.

Measures, on the real chip, where the 129 ms/batch constrained solve goes
(prep vs ALM inner vs sub-phases), then times an experimental ALM inner
that fuses the two forward matvecs (lanes.Hq and lanes.Sq) into ONE int8
dot_general over the row-concatenated [Hq; Sq] stack -- same bytes, one
fewer dependent matmul dispatch per inner iteration.  Integer dot is
exact, so the fused variant must be bit-identical; this script asserts it
before timing.  Emits one JSON line.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import fetch_overhead, time_chained, wait_device_ready
from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP
from pint_tpu.mpc.sqp_constrained import _alm_batched, _Y_SHIFT, _lower_words
from pint_tpu.mpc.constrained import _LAM_CAP, _Y_BITS
from pint_tpu.models.dynamics import CONTROL_LAYOUT, pack_controls, unpack_controls
from pint_tpu.ops import word as W


def note(m):
    print(f"[exp {time.time()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)


T0 = time.time()
assert wait_device_ready(log=note), "device not ready"
overhead = fetch_overhead()
note(f"overhead {overhead*1e3:.1f} ms on {jax.devices()[0].device_kind}")

batch = 4096
devc = DeviceConstrainedSQP(
    DeviceSQP(horizon=32, sqp_iters=4, pgd_iters=30,
              x_ref=np.array([1.0, 0.0, 0.0])),
    F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0, alm_outer=3,
)
d = devc.dev
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, batch), rng.uniform(-0.2, 0.2, batch),
     rng.uniform(-np.pi, np.pi, batch)], axis=-1).astype(np.float32))
u0 = devc.init_words(batch)
lam0 = devc.init_lam(batch)
lanes0 = jnp.asarray(
    rng.integers(-100, 100, (batch, d.n_dec), dtype=np.int32))

out = {"batch": batch, "T": d.horizon, "sqp_iters": d.sqp_iters,
       "alm_outer": devc.alm_outer, "pgd_iters": d.pgd_iters}

# ---- full solve (4 SQP outers; compile-cached from bench runs) ----------
sec = time_chained(
    lambda st, x: devc._solve_jit(st[0], x, st[1]), (u0, lam0), x0,
    inner=16, reps=3, overhead=overhead)
out["full_s_per_batch"] = sec
per_outer = sec / d.sqp_iters
out["per_outer_s"] = per_outer
note(f"full: {sec*1e3:.1f} ms/batch, {per_outer*1e3:.2f} ms/outer")

# ---- prep: the whole traced condense+stack+quantize, per outer ----------
def prep(x, lanes):
    ops, c_unit = devc._condense_constrained_dev(x, lanes)
    acc = c_unit
    for k in ("g_pre", "c_off", "lo_pre"):
        acc = acc + ops[k][:, 0].astype(jnp.float32) * jnp.float32(1e-20)
    acc = acc + ops["Hq"][:, 0, 0].astype(jnp.float32) * jnp.float32(1e-20)
    acc = acc + ops["Sq"][:, 0, 0].astype(jnp.float32) * jnp.float32(1e-20)
    return x + acc[:, None] * jnp.float32(1e-20)

out["prep_s_per_outer"] = time_chained(
    prep, x0, lanes0, inner=64, reps=3, overhead=overhead)
note(f"prep: {out['prep_s_per_outer']*1e3:.2f} ms/outer")

# ---- sub-phases of prep -------------------------------------------------
A_seq, B_lane, c_seq = jax.jit(d._linearize_phase)(x0, lanes0)
Abar, Bbar_all, Cbar = jax.jit(d._propagate_scan)(A_seq, B_lane, c_seq)

def stack(v, Abar, Bbar_all, Cbar):
    S_t, P_t, r_t = devc._stack_constraints(
        Abar, Bbar_all + v * jnp.float32(1e-38), Cbar)
    return v + (S_t[0, 0] + P_t[0, 0] + r_t[0]) * jnp.float32(1e-20)

out["stack_s_per_outer"] = time_chained(
    stack, jnp.zeros((batch,), jnp.float32), Abar, Bbar_all, Cbar,
    inner=256, reps=3, overhead=overhead)
note(f"stack: {out['stack_s_per_outer']*1e3:.3f} ms/outer")

S_t, P_t, r_t = jax.jit(devc._stack_constraints)(Abar, Bbar_all, Cbar)

def penlip(v, S_t):
    pl = devc._pen_lipschitz(S_t + v * jnp.float32(1e-38))
    return v + pl * jnp.float32(1e-20)

out["pen_lipschitz_s_per_outer"] = time_chained(
    penlip, jnp.zeros((batch,), jnp.float32), S_t,
    inner=256, reps=3, overhead=overhead)
note(f"pen_lipschitz: {out['pen_lipschitz_s_per_outer']*1e3:.3f} ms/outer")

# ---- ALM inner with real operands (3 ALM x 30 PGD, per outer) -----------
ops, c_unit = jax.jit(devc._condense_constrained_dev)(x0, lanes0)
ops = jax.tree.map(jax.block_until_ready, ops)
ALM_KW = dict(outer=devc.alm_outer, inners=d.pgd_iters,
              g_shift=d.g_shift, y_shift=_Y_SHIFT)
ORDER = ("g_pre", "Hq", "hs_num", "hs_den", "Sq", "cs_num", "cs_den",
         "c_off", "lo_pre", "hi_pre", "eh_num", "eh_den", "el_num",
         "el_den")

def alm(st):
    w, lam = st
    return _alm_batched(w, *[ops[k] for k in ORDER], lam, **ALM_KW)

out["alm_s_per_outer"] = time_chained(
    lambda st: alm(st), (u0, lam0), inner=64, reps=3, overhead=overhead)
note(f"alm: {out['alm_s_per_outer']*1e3:.2f} ms/outer")

shares = {
    "prep": out["prep_s_per_outer"] / per_outer,
    "alm": out["alm_s_per_outer"] / per_outer,
    "stack(sub)": out["stack_s_per_outer"] / per_outer,
    "pen_lipschitz(sub)": out["pen_lipschitz_s_per_outer"] / per_outer,
    "unattributed": 1.0 - (out["prep_s_per_outer"]
                           + out["alm_s_per_outer"]) / per_outer,
}
out["phase_shares_of_outer"] = shares
note(f"shares: {json.dumps({k: round(v, 3) for k, v in shares.items()})}")

# ---- experiment: fused [Hq; Sq] forward matvec --------------------------
def alm_fused(u_words, lam_in):
    Hq, Sq = ops["Hq"], ops["Sq"]
    Tp = Hq.shape[1]
    M = jnp.concatenate([Hq, Sq], axis=1)            # (B, Tp+Cp, Tp)
    hs_num, hs_den = ops["hs_num"], ops["hs_den"]
    cs_num, cs_den = ops["cs_num"], ops["cs_den"]
    c_off, lo_pre, hi_pre = ops["c_off"], ops["lo_pre"], ops["hi_pre"]
    eh_num, eh_den = ops["eh_num"], ops["eh_den"]
    el_num, el_den = ops["el_num"], ops["el_den"]
    g_pre = ops["g_pre"]
    g_shift, y_shift = d.g_shift, _Y_SHIFT
    lower = jnp.full((1,), _lower_words(), jnp.uint32)
    half = np.int32(1 << (g_shift - 1))
    y_half = np.int32((1 << y_shift) >> 1) if y_shift else np.int32(0)
    y_cap = np.int32((1 << _Y_BITS) - 1)

    def c_pre_of(lanes):
        acc = jax.lax.dot_general(
            lanes.astype(jnp.int8), Sq,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        return (acc * cs_num[:, None]) >> cs_den[:, None]

    def inner(_, st):
        words, carry, ey, lam = st
        lanes = unpack_controls(words)
        acc_all = jax.lax.dot_general(
            lanes.astype(jnp.int8), M,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)        # (B, Tp+Cp)
        pre = (acc_all[:, :Tp] * hs_num[:, None]) >> hs_den[:, None]
        t = ((acc_all[:, Tp:] * cs_num[:, None]) >> cs_den[:, None]
             ) + c_off + lam
        y = t - jnp.clip(t, lo_pre, hi_pre) + ey
        y14 = jnp.clip((y + y_half) >> np.int32(y_shift), -y_cap, y_cap)
        ey = y - (y14 << np.int32(y_shift))
        y_hi = y14 >> np.int32(7)
        y_lo = y14 - (y_hi << np.int32(7))
        y_stack = jnp.stack(
            [y_hi.astype(jnp.int8), y_lo.astype(jnp.int8)], axis=1)
        acc_hl = jax.lax.dot_general(
            y_stack, Sq,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        extra = ((acc_hl[:, 0] * eh_num[:, None]) >> eh_den[:, None]
                 ) + ((acc_hl[:, 1] * el_num[:, None]) >> el_den[:, None])
        step = -(pre + g_pre + extra) + carry
        delta = jnp.clip((step + half) >> np.int32(g_shift), -128, 127)
        carry = step - (delta << np.int32(g_shift))
        words = W.add_signed_saturate(
            CONTROL_LAYOUT, words, pack_controls(delta))
        words = W.max_signed(
            CONTROL_LAYOUT, words, jnp.broadcast_to(lower, words.shape))
        return words, carry, ey, lam

    def outer_body(_, st):
        words, carry, ey, lam = st
        words, carry, ey, lam = jax.lax.fori_loop(
            0, d.pgd_iters, inner, (words, carry, ey, lam))
        t = c_pre_of(unpack_controls(words)) + c_off + lam
        lam = jnp.clip(t - jnp.clip(t, lo_pre, hi_pre),
                       -_LAM_CAP, _LAM_CAP)
        return words, carry, ey, lam

    carry0 = g_pre ^ g_pre
    ey0 = c_off ^ c_off
    words, _, _, lam = jax.lax.fori_loop(
        0, devc.alm_outer, outer_body, (u_words, carry0, ey0, lam_in))
    return words, lam

alm_fused_j = jax.jit(alm_fused)
w_ref, lam_ref = jax.jit(lambda w, l: alm(( w, l)))(u0, lam0)
w_fus, lam_fus = alm_fused_j(u0, lam0)
bit_ok = bool(jnp.all(w_ref == w_fus)) and bool(jnp.all(lam_ref == lam_fus))
out["fused_bit_identical"] = bit_ok
note(f"fused bit-identical: {bit_ok}")

out["alm_fused_s_per_outer"] = time_chained(
    lambda st: alm_fused_j(st[0], st[1]), (u0, lam0),
    inner=64, reps=3, overhead=overhead)
note(f"alm_fused: {out['alm_fused_s_per_outer']*1e3:.2f} ms/outer "
     f"(vs {out['alm_s_per_outer']*1e3:.2f})")
out["fused_speedup_alm"] = (
    out["alm_s_per_outer"] / out["alm_fused_s_per_outer"])

print(json.dumps(out))
