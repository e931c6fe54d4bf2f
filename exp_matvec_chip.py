"""Time the shipped tp-column matvec kernel (fused_alm.pgd_matvec_cols)
against the XLA int8 dot it replaces, at real tp geometries (B=4096,
Tm=64; K = Tm/tp for tp in {2, 4}), 30 chained calls per sample (the
per-outer launch count).  Writes EXP_MATVEC.json."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import time_chained, fetch_overhead, wait_device_ready
from pint_tpu.mpc.fused_alm import pgd_matvec_cols

T0 = time.time()
note = lambda m: print(f"[mv {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {}
B, Tm = 4096, 64
rng = np.random.default_rng(0)

for tp in (2, 4):
    K = Tm // tp
    hqt_r = jnp.asarray(
        rng.integers(-127, 128, (K, Tm, B), dtype=np.int8))
    Hq_cols = jnp.asarray(
        np.moveaxis(np.asarray(hqt_r), -1, 0).transpose(0, 2, 1)
    )  # (B, Tm, K): Hq_cols[b, s, t] = hqt_r[t, s, b]
    lanes0 = jnp.asarray(
        rng.integers(-127, 128, (B, K), dtype=np.int32))

    def kern_step(lanes):
        p = pgd_matvec_cols(lanes, hqt_r, block=256)
        # feed back so 30 launches chain (mimics the inner loop)
        return (lanes + p[:, :K]) & 127

    def xla_step(lanes):
        p = jax.lax.dot_general(
            lanes.astype(jnp.int8), Hq_cols,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        return (lanes + p[:, :K]) & 127

    for name, fn in (("kernel", kern_step), ("xla", xla_step)):
        sec = time_chained(fn, lanes0, inner=30 * 8, reps=5,
                           overhead=OVERHEAD)
        OUT[f"tp{tp}_{name}_us_per_call"] = sec * 1e6
        note(f"tp={tp} {name}: {sec*1e6:.1f} us/call "
             f"({sec*30*1e3:.3f} ms per 30-iter inner)")
    # exactness cross-check
    a = np.asarray(pgd_matvec_cols(lanes0, hqt_r, block=256))
    b = np.asarray(jax.lax.dot_general(
        lanes0.astype(jnp.int8), Hq_cols,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32))
    OUT[f"tp{tp}_bitexact"] = bool((a == b).all())
    note(f"tp={tp} kernel == XLA dot: {OUT[f'tp{tp}_bitexact']}")

with open("EXP_MATVEC.json", "w") as f:
    json.dump(OUT, f, indent=2)
note("wrote EXP_MATVEC.json")
print(json.dumps(OUT))
