"""MPC serving layer: warm starts, validation, self-healing."""

import numpy as np
import pytest

from pint_tpu.mpc import condense_double_integrator, quantize
from pint_tpu.serving import MPCService


@pytest.fixture(scope="module")
def service():
    qqp = quantize(condense_double_integrator(T=32))
    return MPCService(qqp, batch=8, iters_per_tick=12, use_fused=False)


def test_service_ticks_and_warms(service):
    rng = np.random.default_rng(0)
    x0 = np.stack([rng.uniform(-2, 2, 8), rng.uniform(-1, 1, 8)], axis=-1)
    u1 = service.solve(x0)
    assert u1.shape == (8, 32)
    assert np.abs(u1).max() <= service.qqp.qp.u_max + 1e-9
    # second tick runs warm-started
    u2 = service.solve(x0 * 0.99)
    assert service.stats.ticks == 2
    assert service.stats.last_latency_s > 0


def test_service_rejects_wrong_batch(service):
    with pytest.raises(ValueError):
        service.solve(np.zeros((3, 2)))


def test_service_heals_bad_rows(service):
    x0 = np.zeros((8, 2))
    x0[2, 0] = np.nan
    u = service.solve(x0)
    assert service.stats.resets >= 1
    # the poisoned row returns a safe zero plan
    np.testing.assert_array_equal(u[2], 0.0)
    # subsequent normal ticks continue fine
    u2 = service.solve(np.zeros((8, 2)))
    assert np.isfinite(u2).all()
