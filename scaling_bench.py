"""MPC solves/s scaling sweep over mesh sizes (1 chip -> full slice).

BASELINE.json's second headline: >= 80% linear solves/s scaling 1 -> 4 hosts
on quantized MPC with H=50.  This harness measures solves/s for growing dp
meshes over whatever devices are available:

* on a real multi-chip slice / pod: the actual scaling measurement
  (launch one process per host; `pint_tpu.parallel.distributed.initialize`
  wires jax.distributed; rates aggregate across hosts);
* on a single chip or CPU: a harness smoke test (numbers are not
  hardware-meaningful, but the sweep, sharding and aggregation paths are
  the same ones a pod run uses).

Usage: python scaling_bench.py [--tp N] [--batch-per-device N] [--cpu]
``--cpu`` forces the virtual-CPU backend (with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` set in the
environment) via ``jax.config.update`` -- the env var JAX_PLATFORMS
alone is IGNORED once the axon PJRT plugin registers (CLAUDE.md).
Writes SCALING.json and prints one summary JSON line.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


def measure(dp: int, tp: int, batch_per_device: int, iters: int, overhead: float):
    from pint_tpu.mpc import condense_double_integrator, quantize
    from pint_tpu.parallel import ShardedPGD, make_mesh
    from pint_tpu.utils.timing import time_chained

    qqp = quantize(condense_double_integrator(T=50))
    mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[: dp * tp])
    solver = ShardedPGD(qqp, mesh, iters=iters)

    batch = batch_per_device * dp
    rng = np.random.default_rng(0)
    x0 = np.stack(
        [rng.uniform(-3, 3, batch), rng.uniform(-1, 1, batch)], axis=-1
    )
    g = solver.place_g(qqp.g_lane_fixed(x0))
    u0 = solver.init_words(batch)

    def step(carry, gg):
        words, _ = solver.solve_words(carry[0], gg)
        return (words, carry[1])

    sec = time_chained(
        step, (u0, jnp.zeros((), jnp.float32)), g,
        inner=32, reps=3, overhead=overhead,
    )
    return batch / sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--batch-per-device", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--cpu", action="store_true",
                    help="force the (virtual multi-device) CPU backend; "
                         "the JAX_PLATFORMS env var alone is ignored "
                         "once the axon plugin registers")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pint_tpu.parallel.distributed import aggregate_rate, initialize
    from pint_tpu.utils.timing import fetch_overhead

    initialize()
    n = jax.device_count()
    overhead = fetch_overhead()

    # stamp the artifact so smoke numbers can't masquerade as measurements:
    # "scaling" over virtual devices sharing one host CPU, or over a single
    # physical chip, is meaningless by construction
    platform = jax.devices()[0].platform
    real_multi_device = platform != "cpu" and n > 1
    environment = {
        "kind": ("tpu-slice" if real_multi_device else
                 "cpu-virtual-smoke" if platform == "cpu" else
                 f"single-{platform}-smoke"),
        "platform": platform,
        "device_kind": jax.devices()[0].device_kind,
        "device_count": n,
        "process_count": jax.process_count(),
    }
    if not real_multi_device:
        print(
            "WARNING: no real multi-device hardware -- this run exercises "
            "the sweep/sharding/aggregation paths only; efficiency numbers "
            "are NOT hardware-meaningful (see SCALING.md for the analytic "
            "projection)",
            flush=True,
        )

    dps = sorted({1, 2, 4, 8, n // args.tp} & set(range(1, n // args.tp + 1)))
    results = {
        "environment": environment,
        "hardware_meaningful": real_multi_device,
        "devices": n,
        "tp": args.tp,
        "sweep": {},
    }
    base = None
    for dp in dps:
        rate = aggregate_rate(
            measure(dp, args.tp, args.batch_per_device, args.iters, overhead)
        )
        eff = 1.0 if base is None else rate / (base * dp)
        if base is None:
            base = rate
        results["sweep"][str(dp)] = {
            "solves_per_s": rate,
            "scaling_efficiency": eff,
        }
        print(f"dp={dp}: {rate/1e6:.2f}M solves/s (eff {eff:.2%})", flush=True)

    with open("SCALING.json", "w") as f:
        json.dump(results, f, indent=2)
    last = results["sweep"][str(dps[-1])]
    print(
        json.dumps(
            {
                "metric": f"mpc_scaling_dp{dps[-1]}_tp{args.tp}",
                "value": round(last["solves_per_s"] / 1e6, 3),
                "unit": "Msolves/s",
                "vs_baseline": round(last["scaling_efficiency"], 4),
                "environment": environment["kind"],
                "hardware_meaningful": real_multi_device,
            }
        )
    )


if __name__ == "__main__":
    main()
