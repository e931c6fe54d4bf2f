"""On-chip check + timing for the fused ALM kernel (headline config)."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import fetch_overhead, time_chained, wait_device_ready
from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP
from pint_tpu.mpc.sqp_constrained import _alm_batched, _Y_SHIFT
from pint_tpu.mpc.fused_alm import alm_fused_words

T0 = time.time()


def note(m):
    print(f"[fused {time.time()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)


assert wait_device_ready(log=note), "device not ready"
overhead = fetch_overhead()
note(f"overhead {overhead*1e3:.1f} ms")

batch = 4096
mk = lambda **kw: DeviceConstrainedSQP(
    DeviceSQP(horizon=32, sqp_iters=4, pgd_iters=30,
              x_ref=np.array([1.0, 0.0, 0.0])),
    F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0, alm_outer=3, **kw)
devc = mk(fused=False)
d = devc.dev
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, batch), rng.uniform(-0.2, 0.2, batch),
     rng.uniform(-np.pi, np.pi, batch)], axis=-1).astype(np.float32))
u0 = devc.init_words(batch)
lam0 = devc.init_lam(batch)
lanes0 = jnp.asarray(
    rng.integers(-100, 100, (batch, d.n_dec), dtype=np.int32))
ops, _ = jax.jit(devc._condense_constrained_dev)(x0, lanes0)
ORDER = ("g_pre", "Hq", "hs_num", "hs_den", "Sq", "cs_num", "cs_den",
         "c_off", "lo_pre", "hi_pre", "eh_num", "eh_den", "el_num",
         "el_den")
kw = dict(outer=devc.alm_outer, inners=d.pgd_iters,
          g_shift=d.g_shift, y_shift=_Y_SHIFT)
out = {"batch": batch}

note("compiling fused ALM kernel (native Mosaic)...")
fused_j = jax.jit(lambda w, l, blk: None)  # placeholder not used
w_ref, l_ref = jax.jit(lambda w, l: _alm_batched(
    w, *[ops[k] for k in ORDER], l, **kw))(u0, lam0)
for blk in (256, 128, 512):
    try:
        t0 = time.time()
        f = jax.jit(lambda w, l, _b=blk: alm_fused_words(
            w, *[ops[k] for k in ORDER], l, block=_b, **kw))
        w_f, l_f = f(u0, lam0)
        ok = bool(jnp.all(w_ref == w_f)) and bool(jnp.all(l_ref == l_f))
        note(f"block={blk}: compile+run {time.time()-t0:.1f}s "
             f"bit-identical={ok}")
        out[f"bit_identical_b{blk}"] = ok
        if not ok:
            continue
        sec = time_chained(lambda st, _f=f: _f(st[0], st[1]), (u0, lam0),
                           inner=64, reps=3, overhead=overhead)
        out[f"alm_fused_s_per_outer_b{blk}"] = sec
        note(f"block={blk}: {sec*1e3:.2f} ms/outer (XLA path was 24.37)")
    except Exception as e:
        out[f"block_{blk}_error"] = repr(e)[:200]
        note(f"block={blk}: FAILED {repr(e)[:120]}")

# full solver end to end, fused default
devcF = mk(fused=True, fused_block=256)
w_a, l_a = jax.jit(lambda u, x, l: devc._solve_jit(u, x, l))(u0, x0, lam0)
w_b, l_b = devcF._solve_jit(u0, x0, lam0)
ok = bool(jnp.all(w_a == w_b)) and bool(jnp.all(l_a == l_b))
out["solver_bit_identical"] = ok
note(f"full solver bit-identical={ok}")
sec = time_chained(lambda st, x: devcF._solve_jit(st[0], x, st[1]),
                   (u0, lam0), x0, inner=16, reps=3, overhead=overhead)
out["fused_full_s_per_batch"] = sec
out["fused_solves_per_s"] = batch / sec
note(f"fused full solve: {sec*1e3:.1f} ms/batch = {batch/sec:.0f} solves/s "
     f"(XLA path: 129 ms, 31.7K)")
print(json.dumps(out))
