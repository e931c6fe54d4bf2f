"""Device timing utilities that survive asynchronous PJRT backends.

On some backends (notably tunneled/remote PJRT plugins),
``jax.block_until_ready`` returns as soon as the dispatch is acknowledged,
NOT when execution completes -- only a device-to-host transfer truly
synchronizes.  Timing there must (a) chain reps through data dependencies so
the device cannot overlap or elide them, and (b) end the timed region with a
small host fetch of a value data-dependent on the last rep.

:func:`time_chained` implements that pattern: the op under test is wrapped
so rep ``k+1`` consumes rep ``k``'s output, and a scalar derived from the
final output is fetched to host inside the timed window.  The scalar is an
output of the same XLA program chain, so its availability implies the whole
chain executed.  Fetch overhead is measured once with an empty chain and
subtracted.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["time_chained", "fetch_overhead", "wait_device_ready"]


def wait_device_ready(
    probe_timeout_s: float = 60.0,
    total_budget_s: float = 450.0,
    log=None,
) -> bool:
    """Bounded readiness probe for a tunneled/pooled accelerator.

    The pooled chip can be held by another tenant, or the remote terminal
    can wedge, so that claims and compiles succeed (``jax.devices()``
    lists the chip) but every result fetch blocks forever.  A blocked
    transfer is uninterruptible from Python, so each probe runs a trivial
    jitted fetch in a daemon thread with a join timeout, retrying until
    ``total_budget_s``.  Returns True the moment a fetch completes; False
    if the device never answered (callers should fail fast with a
    diagnostic rather than hang -- and exit via ``os._exit`` if probe
    threads are still blocked, since normal interpreter teardown aborts
    on threads stuck inside PJRT transfer calls).

    ``log`` is an optional ``str -> None`` progress callback.
    """
    import threading

    say = log or (lambda _m: None)
    deadline = time.time() + total_budget_s
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        ok = threading.Event()
        err: list = []

        def probe():
            try:
                y = jax.jit(lambda v: v + jnp.int32(1))(
                    jnp.zeros((8,), jnp.int32)
                )
                float(np.asarray(y)[0])
                ok.set()
            except Exception as e:  # noqa: BLE001 -- diagnostic path
                err.append(e)

        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(min(probe_timeout_s, max(deadline - time.time(), 5.0)))
        if ok.is_set():
            say(f"device ready (probe attempt {attempt})")
            return True
        if err:
            say(f"device probe raised: {err[0]!r}")
        else:
            say(
                f"device probe attempt {attempt}: no response in "
                f"{probe_timeout_s:.0f}s (execution wedged or chip busy)"
            )
    return False


def _sync_scalar(x) -> float:
    """Host-fetch a cheap scalar data-dependent on ``x``."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    flat = leaf.reshape(-1)[:1]
    return float(np.asarray(flat)[0])


def fetch_overhead(reps: int = 5) -> float:
    """Seconds for a minimal dispatch + scalar host fetch."""
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((1,), jnp.int32)
    _sync_scalar(f(x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync_scalar(f(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def time_chained(
    step: Callable,
    x0,
    *consts,
    reps: int = 5,
    inner: int = 100,
    overhead: Optional[float] = None,
    stats_out: Optional[list] = None,
) -> float:
    """Median seconds per execution of ``step(x, *consts) -> x_next``.

    ``step`` must map its first argument's pytree structure to itself so
    iterations chain through a data dependency (the device cannot elide or
    overlap them).  ``inner`` iterations run inside ONE jitted
    `lax.fori_loop` program, so each timed sample pays the host round-trip
    once for ``inner`` executions; the measured round-trip overhead is
    subtracted on top.

    If ``stats_out`` is given, ``(sec_min, sec_median, sec_max)`` across
    the ``reps`` samples is appended to it -- the per-metric spread the
    bench records so run-to-run variance is visible per metric instead of
    as prose ranges.
    """

    @jax.jit
    def chain(x, *cs):
        return jax.lax.fori_loop(0, inner, lambda i, y: step(y, *cs), x)

    # warm (compile) + one synchronized execution
    x = chain(x0, *consts)
    _sync_scalar(x)

    if overhead is None:
        overhead = fetch_overhead()

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = chain(x0, *consts)
        _sync_scalar(x)
        times.append(time.perf_counter() - t0 - overhead)
    per = np.asarray(times, dtype=float) / inner
    if stats_out is not None:
        stats_out.append(
            (max(float(per.min()), 1e-12),
             max(float(np.median(per)), 1e-12),
             max(float(per.max()), 1e-12))
        )
    return max(float(np.median(per)), 1e-12)
