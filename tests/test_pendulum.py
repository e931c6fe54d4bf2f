"""Torque-limited pendulum family + SQP swing-up (the underactuated
second-order planning benchmark)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pint_tpu.models import Pendulum, pack_controls
from pint_tpu.mpc import QuantizedSQP


@pytest.fixture(scope="module")
def model():
    return Pendulum()


def test_quantized_rollout_matches_reference(model):
    rng = np.random.default_rng(0)
    lanes = rng.integers(-127, 128, (16, 64), dtype=np.int64).astype(np.int32)
    th0 = rng.uniform(-0.5, 0.5, 16)
    om0 = rng.uniform(-1.0, 1.0, 16)
    x0 = np.stack([th0, om0], axis=-1)
    fp = model.rollout(jnp.asarray(model.to_fixed(x0)), jnp.asarray(lanes))
    got = model.to_float(np.asarray(fp))
    exp = model.reference_rollout(x0, lanes[..., None] * model.u_scale)
    # truncating shifts lose <= 1 LSB per add; omega errors integrate into
    # theta over T steps
    T = 64
    tol = 4 * T * T * 2.0**-16
    assert np.abs(got - exp).max() <= tol


def test_rollout_packed_matches_unpacked(model):
    rng = np.random.default_rng(1)
    lanes = rng.integers(-127, 128, (8, 32), dtype=np.int64).astype(np.int32)
    x0 = jnp.zeros((8, 2), jnp.int32)
    a = model.rollout(x0, jnp.asarray(lanes))
    b = model.rollout_packed(x0, pack_controls(jnp.asarray(lanes)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_theta_wraps_mod_turn(model):
    """Q16 turns wrap: a full-turn offset changes nothing in the torque."""
    x0a = jnp.asarray([[0, 1 << 14]], jnp.int32)            # omega > 0
    x0b = jnp.asarray([[1 << 16, 1 << 14]], jnp.int32)      # +1 full turn
    lanes = jnp.full((1, 16), 20, jnp.int32)
    a = np.asarray(model.rollout(x0a, lanes))
    b = np.asarray(model.rollout(x0b, lanes))
    np.testing.assert_array_equal(a[..., 1], b[..., 1])     # same omega
    np.testing.assert_array_equal(a[..., 0] + (1 << 16), b[..., 0])


def test_linearize_vs_finite_differences(model):
    rng = np.random.default_rng(2)
    states = np.stack(
        [rng.uniform(-0.8, 0.8, 24), rng.uniform(-1.5, 1.5, 24)], axis=-1
    )
    controls = rng.uniform(-0.9, 0.9, (24, 1))
    A, B = model.linearize(states, controls)

    def step(x, u):
        return model.reference_rollout(x, u[None, :])[1]

    eps = 1e-7
    for i in range(24):
        for j in range(2):
            e = np.zeros(2)
            e[j] = eps
            col = (
                step(states[i] + e, controls[i])
                - step(states[i] - e, controls[i])
            ) / (2 * eps)
            np.testing.assert_allclose(A[i, :, j], col, atol=1e-5)
        e = np.array([eps])
        col = (
            step(states[i], controls[i] + e)
            - step(states[i], controls[i] - e)
        ) / (2 * eps)
        np.testing.assert_allclose(B[i, :, 0], col, atol=1e-5)


# -- SQP swing-up -------------------------------------------------------------


@pytest.fixture(scope="module")
def swingup(model):
    return QuantizedSQP(
        model=model, horizon=128, sqp_iters=8, pgd_iters=60,
        Q=np.diag([1.0, 0.05]), R=np.array([[0.05]]),
        qf_scale=80.0, x_ref=np.zeros(2),
    )


@pytest.fixture(scope="module")
def swingup_solution(swingup):
    return swingup.solve(np.array([[0.5, 0.0]]))  # hanging, at rest


def test_swingup_is_underactuated(model):
    """The torque ceiling is below peak gravity torque: no single-pull
    solution exists, so reaching upright certifies energy pumping."""
    assert model.u_max < model.k_g


def test_swingup_reaches_upright(swingup, swingup_solution):
    words, costs = swingup_solution
    assert (np.diff(costs, axis=-1) < 1e-6).all(), costs
    plan = swingup.plan_phys(words)
    traj = swingup.model.reference_rollout(np.array([[0.5, 0.0]]), plan)
    th_f, om_f = traj[0, -1]
    assert abs(th_f) < 0.1 and abs(om_f) < 0.3, traj[0, -1]
    # the plan pumps: the torque reverses sign at least twice
    u = plan[0, :, 0]
    active = u[np.abs(u) > 0.05]
    sign_changes = int(np.sum(np.abs(np.diff(np.sign(active))) > 0))
    assert sign_changes >= 2, sign_changes


def test_swingup_on_quantized_plant(swingup, swingup_solution):
    """The packed int8 plan drives the fixed-point plant itself to upright,
    not just the float64 twin."""
    words, _ = swingup_solution
    model = swingup.model
    lanes = swingup.lanes(words)[:, : swingup.horizon]
    fp0 = jnp.asarray(model.to_fixed(np.array([[0.5, 0.0]])))
    states = model.rollout(fp0, jnp.asarray(lanes))
    final = model.to_float(np.asarray(states))[0, -1]
    assert abs(final[0]) < 0.11 and abs(final[1]) < 0.35, final


def test_swingup_matches_float64_reference(swingup, swingup_solution):
    _, costs = swingup_solution
    _, ref_costs = swingup.reference_solve(np.array([[0.5, 0.0]]))
    np.testing.assert_allclose(
        costs[:, -1], ref_costs[:, -1], rtol=0.02
    )
