"""Planar quadrotor: fixed-point dynamics + multi-input condensed-QP hover
control in closed loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pint_tpu.models.quadrotor import PlanarQuadrotor
from pint_tpu.mpc import FixedPointPGD, condense_lti, quantize


@pytest.fixture(scope="module")
def model():
    return PlanarQuadrotor()


def test_hover_is_equilibrium(model):
    """Zero lanes at zero state: gravity exactly cancels hover thrust."""
    state = jnp.zeros((1, 6), jnp.int32)
    z = jnp.zeros((1,), jnp.int32)
    nxt = model.step(state, z, z)
    # ay = total*cos - g = (2*hover)*1 - g; cos_q14(0) = 2^14 exactly?
    # parabola at quarter turn: half=2^14 -> peak exactly 2^14 -> cos=1.0
    resid = np.asarray(nxt)[0]
    assert abs(int(resid[4])) <= 2  # <= 2 LSB from rounding of g/2*2
    assert not resid[[0, 1, 2, 3, 5]].any()


def test_matches_float64_reference(model):
    rng = np.random.default_rng(0)
    B, T = 16, 40
    lanes = rng.integers(-40, 40, size=(B, T, 2), dtype=np.int32)
    state0 = np.zeros((B, 6))
    state0[:, 0] = rng.uniform(-1, 1, B)
    state0[:, 1] = rng.uniform(-1, 1, B)
    s0 = model.to_fixed(state0)

    states = model.rollout(jnp.asarray(s0), jnp.asarray(lanes))
    got = model.to_float(np.asarray(states))
    expected = model.reference_rollout(
        state0, lanes.astype(np.float64) * model.f_scale
    )
    # dominant quantization: the 4-bit pre-shift of the thrust-trig product
    # truncates up to 15 Q16-LSB of thrust -> ~240 LSB (~0.004) accel error
    # per step, integrating into velocity and then position over T steps
    a_err = 240 * 2.0**-model.frac_bits
    tol = a_err * T * model.dt * (1 + T * model.dt) + T * 4 * 2.0**-16
    np.testing.assert_allclose(got, expected, rtol=0, atol=max(tol, 0.02))


def test_hover_mpc_closed_loop(model):
    """Multi-input condensed QP (n=6, m=2) stabilizes the nonlinear
    fixed-point plant from an offset + tilt."""
    A, B = model.hover_lti()
    T = 40
    Q = np.diag([4.0, 4.0, 2.0, 0.5, 0.5, 0.5])
    u_max = 100 * model.f_scale  # +-100 lanes of thrust authority
    qp = condense_lti(A, B, Q, 0.05, 10 * Q, T, np.zeros(6), u_max)
    qqp = quantize(qp)
    assert qqp.u_scale == pytest.approx(u_max / 127)
    solver = FixedPointPGD(qqp, iters=25, error_feedback=True)

    # device-side linear term (same folding as RecedingHorizonController)
    from pint_tpu.models.dynamics import pack_controls, unpack_controls

    scale = qqp.Gq_scale * 2.0**-model.frac_bits
    Gm = np.zeros((6, qqp.padded), np.float32)
    Gm[:, : qqp.horizon] = (qp.G * scale).T.astype(np.float32)
    g_ref = np.zeros((qqp.padded,), np.float32)
    g_ref[: qqp.horizon] = (qp.g_ref * qqp.Gq_scale).astype(np.float32)

    def tick(carry, _):
        state, u_words = carry
        g = jnp.round(
            state.astype(jnp.float32) @ jnp.asarray(Gm) + jnp.asarray(g_ref)
        ).astype(jnp.int32)
        u_words = solver.solve_words(u_words, g)
        lanes = unpack_controls(u_words)
        state2 = model.step(state, lanes[..., 0], lanes[..., 1])
        shifted = jnp.concatenate(
            [lanes[..., 2:], jnp.zeros_like(lanes[..., :2])], axis=-1
        )
        return (state2, pack_controls(shifted)), state2

    state0 = jnp.asarray(
        model.to_fixed(np.array([[0.6, -0.4, 0.03, 0.0, 0.0, 0.0]]))
    )
    (_, _), states = jax.jit(
        lambda s: jax.lax.scan(tick, (s, solver.init_words(1)), None,
                               length=160)
    )(state0)
    traj = model.to_float(
        np.concatenate([np.asarray(state0), np.asarray(states)[:, 0]], axis=0)
    )
    # starts offset ...
    assert abs(traj[0, 0]) >= 0.5
    # ... ends hovering near the origin, level and slow
    assert np.abs(traj[-1, :2]).max() < 0.12, traj[-1]
    assert abs(traj[-1, 2]) < 0.02
    assert np.abs(traj[-1, 3:5]).max() < 0.15
