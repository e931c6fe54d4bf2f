"""Name the HLO ops holding the condense_hg residual (VERDICT r4 weak #3).

The hg-assembly stage of a DeviceSQP outer (T=32, B=4096) measures
~2.7 ms against a ~0.45 ms HBM-traffic floor (BASELINE.md bound
paragraph; BENCH_full.json `device_sqp_phases.condense_hg_s_per_outer`).
Round 4 established by elimination (four restructurings built, verified
and timed end to end -- EXP_CONDENSE/EXP_BTRANS) that the gap lives in
relayouts XLA inserts around the batch-trailing contraction, but never
OBSERVED them.  This experiment captures a `jax.profiler` device trace
of the isolated condensation and of the full outer, aggregates per-op
device wall time from the trace protobuf, and writes the top ops to
EXP_REDUCE_TRACE.json -- either exposing an excisable op or upgrading
the bound argument from inference to observation.

Run from the repo root: python - < exp_reduce_trace.py
"""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import wait_device_ready
from pint_tpu.utils.profiling import trace
from pint_tpu.mpc import DeviceSQP

T0 = time.time()
note = lambda m: print(f"[tr {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)

T, B = 32, 4096
d = DeviceSQP(horizon=T, sqp_iters=4, pgd_iters=30,
              Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
              qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
     rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
lanes = jnp.asarray(rng.integers(-100, 100, (B, d.n_dec), dtype=np.int32))

condense = jax.jit(d._condense_ht)
# warm up (compile) before tracing
Ht, g = condense(x0, lanes)
np.asarray(g[:1])
note("condense compiled + warm")

logdir = "/tmp/pint_reduce_trace"
os.system(f"rm -rf {logdir}")
with trace(logdir):
    for _ in range(8):
        Ht, g = condense(x0, lanes)
    np.asarray(g[:1])
note("trace captured")


def load_events(logdir):
    """All complete events from the profiler's trace.json.gz dumps."""
    evs = []
    for p in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(p, "rt") as f:
            doc = json.load(f)
        pid_names = {}
        for e in doc.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        for e in doc.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                evs.append({
                    "pid_name": pid_names.get(e.get("pid"), ""),
                    "name": e.get("name", ""),
                    "dur_us": e["dur"],
                })
    return evs


evs = load_events(logdir)
note(f"{len(evs)} complete events; process lanes: "
     f"{sorted(set(e['pid_name'] for e in evs))[:8]}")

# keep device-side lanes (XLA op events live under TPU/device processes)
dev = [e for e in evs if "TPU" in e["pid_name"] or "/device" in
       e["pid_name"].lower() or "xla" in e["pid_name"].lower()]
pool = dev if dev else evs
agg = {}
for e in pool:
    a = agg.setdefault(e["name"], [0.0, 0])
    a[0] += e["dur_us"]
    a[1] += 1
top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
total_us = sum(v[0] for v in agg.values())
OUT = {
    "config": {"T": T, "B": B, "reps": 8},
    "trace_total_us_all_lanes": total_us,
    "process_lanes": sorted(set(e["pid_name"] for e in evs)),
    "top_ops": [
        {"name": k, "total_us": round(v[0], 1), "count": v[1],
         "us_per_rep": round(v[0] / 8, 1)}
        for k, v in top
    ],
}
with open("EXP_REDUCE_TRACE.json", "w") as f:
    json.dump(OUT, f, indent=1)
note("wrote EXP_REDUCE_TRACE.json")
print(json.dumps(OUT)[:4000])
