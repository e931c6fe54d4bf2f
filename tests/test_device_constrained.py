"""Device-resident state-constrained SQP: the whole nonlinear constrained
loop as one XLA program, checked against the host ConstrainedSQP oracle
chain (float64 reference_solve bounds what any solver at the iteration
budget achieves; feasibility is always on the TRUE nonlinear rollout)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pint_tpu.mpc import ConstrainedSQP, DeviceConstrainedSQP, DeviceSQP
from pint_tpu.mpc.ltv import QuantizedSQP
from pint_tpu.models.dynamics import unpack_controls

X0 = np.array(
    [[0.0, 0.0, np.pi / 2], [0.0, 0.0, -np.pi / 2]], np.float32
)
KW = dict(
    horizon=32, sqp_iters=6, pgd_iters=40,
    x_ref=np.array([1.0, 0.0, 0.0]),
)


@pytest.fixture(scope="module")
def host_pair():
    sqp = QuantizedSQP(**KW)
    return sqp, ConstrainedSQP(
        sqp, F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0,
        alm_outer=4,
    )


@pytest.fixture(scope="module")
def devc():
    return DeviceConstrainedSQP(
        DeviceSQP(**KW),
        F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0, alm_outer=4,
    )


def _lanes(devc, words):
    lanes = np.asarray(unpack_controls(words), np.int64)
    return ((lanes + 128) % 256 - 128).astype(np.float64)


def test_matches_host_constrained_path(host_pair, devc):
    """Final true cost within a percent of the host ConstrainedSQP (which
    itself tracks the float64 reference), feasibility in the same band."""
    sqp, host = host_pair
    w_h, _, costs_h = host.solve(np.asarray(X0, np.float64))
    w_d, lam_d = devc.solve_words(devc.init_words(2), X0)
    lanes_d = _lanes(devc, w_d)
    cost_d = sqp.true_cost(np.asarray(X0, np.float64), lanes_d)
    cost_h = costs_h[:, -1]
    assert np.abs(cost_d - cost_h).max() < 0.02 * np.abs(cost_h).max(), (
        cost_d, cost_h,
    )
    viol_d = devc.violation(X0, lanes_d)
    viol_h = host.violation(
        np.asarray(X0, np.float64), sqp.lanes(w_h)
    )
    assert viol_d.max() < viol_h.max() + 3e-3, (viol_d, viol_h)
    assert int(np.abs(np.asarray(lam_d)).max()) > 0


def test_binding_constraint_actually_binds(host_pair, devc):
    """The corridor genuinely binds: the unconstrained device plan
    overshoots it 2x, the constrained one stays inside (true rollout)."""
    _, host = host_pair
    unc = DeviceSQP(**KW)
    w_u = unc.solve_words(unc.init_words(2), X0)
    lanes_u = _lanes(devc, w_u)
    swing = np.abs(
        host.constraint_trajectory(np.asarray(X0, np.float64), lanes_u)
    ).max()
    assert swing > 2 * 0.03
    w_d, _ = devc.solve_words(devc.init_words(2), X0)
    assert devc.violation(X0, _lanes(devc, w_d)).max() < 0.01


def test_inactive_constraint_is_inert(devc):
    """A corridor wider than the swing leaves multipliers at zero and the
    plan equal to the unconstrained device solve within a lane step."""
    wide = DeviceConstrainedSQP(
        DeviceSQP(**KW), F=[[0.0, 1.0, 0.0]], lo=-5.0, hi=5.0,
        rho=100.0, alm_outer=2,
    )
    w_d, lam = wide.solve_words(wide.init_words(2), X0)
    assert int(np.abs(np.asarray(lam)).max()) == 0
    assert wide.violation(X0, _lanes(wide, w_d)).max() == 0.0


def test_deterministic(devc):
    w1, l1 = devc.solve_words(devc.init_words(2), X0)
    w2, l2 = devc.solve_words(devc.init_words(2), X0)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_warm_start_improves_or_holds(host_pair, devc):
    """Re-solving from the previous (words, lam) must not degrade the true
    cost beyond quantization noise -- the receding-horizon contract."""
    sqp, _ = host_pair
    w1, l1 = devc.solve_words(devc.init_words(2), X0)
    w2, _ = devc.solve_words(w1, X0, l1)
    c1 = sqp.true_cost(np.asarray(X0, np.float64), _lanes(devc, w1))
    c2 = sqp.true_cost(np.asarray(X0, np.float64), _lanes(devc, w2))
    assert (c2 <= c1 * 1.02 + 1e-6).all(), (c1, c2)


def test_one_program(devc):
    assert devc._solve_jit is devc._solve_jit


def test_validation():
    with pytest.raises(ValueError):
        DeviceConstrainedSQP(
            DeviceSQP(**KW), F=[[0.0, 1.0, 0.0]], lo=1.0, hi=-1.0
        )._bounds  # noqa: B018 -- bounds validation is in the property
    bad = DeviceConstrainedSQP(DeviceSQP(**KW), F=[[0.0, 1.0]])
    with pytest.raises((ValueError, TypeError)):
        bad.solve_words(bad.init_words(1), X0[:1])


def test_dp_sharded_bit_identical(devc):
    """shard_map over a dp mesh reproduces the single-device constrained
    solve exactly (batch-parallel loop, exact integer arithmetic; the
    scan/fori carries all derive from device-varying inputs)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    batch = 16
    x0 = np.stack(
        [
            rng.uniform(-0.2, 0.2, batch),
            rng.uniform(-0.2, 0.2, batch),
            rng.uniform(-np.pi, np.pi, batch),
        ],
        axis=-1,
    ).astype(np.float32)
    w_single, l_single = devc.solve_words(devc.init_words(batch), x0)
    mesh = make_mesh(dp=8, tp=1)
    spec = P(("dp", "tp"), None)
    xj = jax.device_put(jnp.asarray(x0), NamedSharding(mesh, spec))
    u0 = jax.device_put(
        devc.init_words(batch), NamedSharding(mesh, spec)
    )
    l0 = jax.device_put(
        devc.init_lam(batch), NamedSharding(mesh, spec)
    )
    sharded = jax.jit(
        jax.shard_map(
            lambda w, x, l: devc._solve_jit(w, x, l),
            mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=(spec, spec),
        )
    )
    w_sh, l_sh = sharded(u0, xj, l0)
    np.testing.assert_array_equal(np.asarray(w_single), np.asarray(w_sh))
    np.testing.assert_array_equal(np.asarray(l_single), np.asarray(l_sh))


def test_padded_rows_are_inert(devc):
    """padded_rows > n_rows: the sentinel bounds keep padding rows out of
    the multiplier updates."""
    assert devc.padded_rows >= devc.n_rows
    w, lam = devc.solve_words(devc.init_words(2), X0)
    lam = np.asarray(lam)
    assert (lam[:, devc.n_rows:] == 0).all()


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4), (1, 8)])
def test_dp_tp_sharded_bit_identical(devc, dp, tp):
    """sharded_solve_words on a dp x tp mesh reproduces the single-device
    constrained solve exactly: objective-gradient and constraint psums are
    exact int32, the per-outer lane all_gather is exact, and the
    tp-replicated condensation/multiplier plane computes identical values
    on every rank."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    rng = np.random.default_rng(7)
    batch = 8 * dp
    x0 = np.stack(
        [
            rng.uniform(-0.2, 0.2, batch),
            rng.uniform(-0.2, 0.2, batch),
            rng.uniform(-np.pi, np.pi, batch),
        ],
        axis=-1,
    ).astype(np.float32)
    w_single, l_single = devc.solve_words(devc.init_words(batch), x0)
    mesh = make_mesh(dp=dp, tp=tp)
    row = NamedSharding(mesh, P("dp", None))
    xj = jax.device_put(jnp.asarray(x0), row)
    u0 = jax.device_put(
        devc.init_words(batch), NamedSharding(mesh, P("dp", "tp"))
    )
    l0 = jax.device_put(devc.init_lam(batch), row)
    w_sh, l_sh = devc.sharded_solve_words(mesh)(u0, xj, l0)
    np.testing.assert_array_equal(np.asarray(w_single), np.asarray(w_sh))
    np.testing.assert_array_equal(np.asarray(l_single), np.asarray(l_sh))


def test_sharded_rejects_bad_tp(devc):
    from pint_tpu.parallel import make_mesh

    # horizon 32 * m 2 = 64 decision lanes; 4*tp=32 does not divide... it
    # does -- use a horizon that breaks: build a small solver with T=18
    from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP

    bad = DeviceConstrainedSQP(
        DeviceSQP(horizon=18, sqp_iters=1, pgd_iters=2),
        F=[[0.0, 1.0, 0.0]],
    )
    with pytest.raises(ValueError, match="divide into 4-lane"):
        bad.sharded_solve_words(make_mesh(dp=1, tp=8))


def test_pendulum_omega_cap():
    """Second model family (pendulum, n=2, single control): a hard
    |omega| <= 0.4 cap on near-upright regulation.  The unconstrained
    plan swings to |omega| ~ 0.65; the constrained one respects the cap
    on the true rollout (small quantized-ALM slack) with active
    multipliers, while a problem naturally inside the cap stays
    untouched."""
    from pint_tpu.models import Pendulum

    dev = DeviceSQP(
        model=Pendulum(), horizon=32, sqp_iters=4, pgd_iters=20,
        Q=np.diag([1.0, 0.05]), R=np.array([[0.05]]), x_ref=np.zeros(2),
    )
    x0 = np.array([[0.6, 0.0], [-0.5, 0.0]], np.float32)
    w_u = dev.solve_words(dev.init_words(2), x0)
    lanes_u = _lanes(dev, w_u)
    u_phys = jnp.asarray(
        lanes_u.reshape(2, 32, 1) * dev._lane_scales, jnp.float32
    )
    traj = np.asarray(dev.model.rollout_f32(jnp.asarray(x0), u_phys))
    swing = np.abs(traj[:, 1:, 1]).max(axis=1)
    assert swing[0] > 0.6          # the cap genuinely binds for problem 0
    assert swing[1] < 0.4          # ... and not for problem 1

    csqp = DeviceConstrainedSQP(
        dev, F=[[0.0, 1.0]], lo=-0.4, hi=0.4, rho=50.0, alm_outer=3
    )
    w_c, lam = csqp.solve_words(csqp.init_words(2), x0)
    viol = csqp.violation(x0, _lanes(csqp, w_c))
    assert viol.max() < 0.01, viol
    assert int(np.abs(np.asarray(lam)[0]).max()) > 0


def test_solve_convenience(devc):
    """Cold-start solve(): plans match solve_words lanes in physical
    units and stay inside the lane box."""
    w, lam, plans = devc.solve(X0)
    w2, lam2 = devc.solve_words(devc.init_words(2), X0)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))
    d = devc.dev
    assert plans.shape == (2, d.horizon, d.n_ctrl)
    assert (np.abs(plans) <= 127 * d._lane_scales + 1e-12).all()
