"""Multi-device sharding tests on the virtual 8-CPU mesh.

The sharded solver must be *bit-identical* to the single-device solver for
every mesh shape: int32 psum is exact and associative, so distribution must
not change a single lane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pint_tpu.models.dynamics import unpack_controls
from pint_tpu.mpc import FixedPointPGD, condense_double_integrator, quantize
from pint_tpu.parallel import ShardedPGD, make_mesh


@pytest.fixture(scope="module")
def qqp():
    return quantize(condense_double_integrator(T=50))


def _x0_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.uniform(-3, 3, size=n), rng.uniform(-1, 1, size=n)], axis=-1
    )


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2)])
def test_sharded_matches_single_device(qqp, dp, tp):
    iters = 25
    mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[: dp * tp])
    sharded = ShardedPGD(qqp, mesh, iters=iters)
    single = FixedPointPGD(qqp, iters=iters)

    x0 = _x0_batch(16)
    words_s, u_s, residual = sharded.solve(x0)
    words_1, u_1 = single.solve(x0)

    np.testing.assert_array_equal(np.asarray(words_s), np.asarray(words_1))
    np.testing.assert_array_equal(np.asarray(u_s), np.asarray(u_1))
    assert np.isfinite(float(residual))


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_sharded_momentum_matches_accelerated(qqp, dp, tp):
    from pint_tpu.mpc.accelerated import AcceleratedPGD

    iters = 15
    mesh = make_mesh(dp=dp, tp=tp)
    sharded = ShardedPGD(qqp, mesh, iters=iters, momentum=True)
    acc = AcceleratedPGD(qqp, iters=iters)
    x0 = _x0_batch(16, seed=9)
    words_s, _, _ = sharded.solve(x0)
    g = jax.numpy.asarray(qqp.g_lane_fixed(x0))
    words_a = jax.jit(acc.solve_words)(acc.init_words(16), g)
    np.testing.assert_array_equal(np.asarray(words_s), np.asarray(words_a))


def test_sharded_solution_quality(qqp):
    mesh = make_mesh(dp=2, tp=4)
    sharded = ShardedPGD(qqp, mesh, iters=60)
    x0 = _x0_batch(8, seed=3)
    _, u_phys, _ = sharded.solve(x0)
    u_ref = qqp.qp.solve_pgd(x0, iters=60)
    err_lanes = np.abs(np.asarray(u_phys) - u_ref) / qqp.u_scale
    assert err_lanes.mean() <= 3.0
    # the authoritative tolerance is cost excess (weak-direction lane noise
    # is cost-free; see test_mpc.py)
    single = FixedPointPGD(qqp, iters=60)
    c_got = single.cost(np.asarray(u_phys), x0)
    c_ref = single.cost(u_ref, x0)
    assert np.all(c_got - c_ref <= 5e-3)


def test_residual_decreases_with_iters(qqp):
    mesh = make_mesh(dp=4, tp=2)
    x0 = _x0_batch(8, seed=4)
    res = []
    for iters in (5, 80):
        solver = ShardedPGD(qqp, mesh, iters=iters)
        _, _, r = solver.solve(x0)
        res.append(float(r))
    assert res[1] < res[0]


def test_batch_sharding_layout(qqp):
    mesh = make_mesh(dp=4, tp=2)
    solver = ShardedPGD(qqp, mesh, iters=5)
    u0 = solver.init_words(16)
    # iterate is sharded over both axes
    assert len(u0.sharding.device_set) == 8
