"""Fused Pallas ALM inner (mpc/fused_alm.py): bit-identity to the XLA
``_alm_batched`` path on real DeviceConstrainedSQP operands, including
batch padding, and through the full solver with ``fused=True``.

The kernel is integer end to end, so identity is exact (word-for-word,
multiplier-for-multiplier) -- the same contract every other solver tier
here keeps (tests/test_fused.py, tests/test_parallel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP
from pint_tpu.mpc.fused_alm import alm_fused_words
from pint_tpu.mpc.sqp_constrained import _Y_SHIFT, _alm_batched

ORDER = ("g_pre", "Hq", "hs_num", "hs_den", "Sq", "cs_num", "cs_den",
         "c_off", "lo_pre", "hi_pre", "eh_num", "eh_den", "el_num",
         "el_den")


def _mk(**kw):
    return DeviceConstrainedSQP(
        DeviceSQP(horizon=8, sqp_iters=2, pgd_iters=6,
                  x_ref=np.array([1.0, 0.0, 0.0])),
        F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0, alm_outer=2,
        **kw,
    )


@pytest.fixture(scope="module")
def real_ops():
    devc = _mk(fused=False)
    d = devc.dev
    rng = np.random.default_rng(7)
    B = 12
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(-np.pi, np.pi, B)], axis=-1).astype(np.float32))
    lanes = jnp.asarray(
        rng.integers(-100, 100, (B, d.n_dec), dtype=np.int32))
    ops, _ = jax.jit(devc._condense_constrained_dev)(x0, lanes)
    return devc, x0, ops


@pytest.mark.parametrize("block", [4, 8, 5])  # 5: B=12 pads to 15
def test_bit_identical_to_alm_batched(real_ops, block):
    devc, x0, ops = real_ops
    d = devc.dev
    B = x0.shape[0]
    u0 = devc.init_words(B)
    lam0 = devc.init_lam(B)
    kw = dict(outer=devc.alm_outer, inners=d.pgd_iters,
              g_shift=d.g_shift, y_shift=_Y_SHIFT)
    w1, l1 = _alm_batched(u0, *[ops[k] for k in ORDER], lam0, **kw)
    w2, l2 = alm_fused_words(
        u0, *[ops[k] for k in ORDER], lam0, block=block, **kw)
    assert jnp.array_equal(w1, w2)
    assert jnp.array_equal(l1, l2)


def test_warm_start_operands_identical(real_ops):
    """Nonzero iterate + multipliers (the receding-horizon path)."""
    devc, x0, ops = real_ops
    d = devc.dev
    B = x0.shape[0]
    rng = np.random.default_rng(3)
    from pint_tpu.models.dynamics import pack_controls

    u0 = pack_controls(jnp.asarray(
        rng.integers(-127, 128, (B, d.n_dec), dtype=np.int32)))
    lam0 = jnp.asarray(rng.integers(
        0, 500, (B, devc.padded_rows), dtype=np.int32))
    kw = dict(outer=devc.alm_outer, inners=d.pgd_iters,
              g_shift=d.g_shift, y_shift=_Y_SHIFT)
    w1, l1 = _alm_batched(u0, *[ops[k] for k in ORDER], lam0, **kw)
    w2, l2 = alm_fused_words(
        u0, *[ops[k] for k in ORDER], lam0, block=8, **kw)
    assert jnp.array_equal(w1, w2)
    assert jnp.array_equal(l1, l2)


def test_full_solver_fused_bit_identical():
    devc_x = _mk(fused=False)
    devc_f = _mk(fused=True, fused_block=8)
    B = 6
    rng = np.random.default_rng(11)
    x0 = np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(-np.pi, np.pi, B)], axis=-1).astype(np.float32)
    u0 = devc_x.init_words(B)
    w1, l1 = devc_x.solve_words(u0, x0)
    w2, l2 = devc_f.solve_words(u0, x0)
    assert jnp.array_equal(w1, w2)
    assert jnp.array_equal(l1, l2)


def test_fused_deterministic():
    devc = _mk(fused=True, fused_block=8)
    B = 4
    x0 = np.array([[0.0, 0.0, 1.0]] * B, np.float32)
    w1, l1 = devc.solve_words(devc.init_words(B), x0)
    w2, l2 = devc.solve_words(devc.init_words(B), x0)
    assert jnp.array_equal(w1, w2)
    assert jnp.array_equal(l1, l2)


@pytest.mark.parametrize("block", [4, 5])
def test_pgd_fused_bit_identical(block):
    from pint_tpu.mpc.fused_alm import pgd_fused_words
    from pint_tpu.mpc.ltv import _pgd_batched_h

    d0 = DeviceSQP(horizon=8, sqp_iters=2, pgd_iters=6,
                   x_ref=np.array([1.0, 0.0, 0.0]), fused=False)
    rng = np.random.default_rng(5)
    B = 12
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
    lanes0 = jnp.asarray(
        rng.integers(-100, 100, (B, d0.n_dec), dtype=np.int32))
    Hq, g_pre, hs_num, hs_den = jax.jit(d0._condense_dev)(x0, lanes0)
    u0 = d0.init_words(B)
    w1 = _pgd_batched_h(u0, g_pre, Hq, hs_num, hs_den,
                        iters=6, g_shift=d0.g_shift)
    w2 = pgd_fused_words(u0, g_pre, Hq, hs_num, hs_den,
                         iters=6, g_shift=d0.g_shift, block=block)
    assert jnp.array_equal(w1, w2)


def test_device_sqp_fused_solver_bit_identical():
    kw = dict(horizon=8, sqp_iters=2, pgd_iters=6,
              x_ref=np.array([1.0, 0.0, 0.0]))
    d0 = DeviceSQP(**kw, fused=False)
    d1 = DeviceSQP(**kw, fused=True, fused_block=8)
    B = 6
    rng = np.random.default_rng(13)
    x0 = np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32)
    u0 = d0.init_words(B)
    assert jnp.array_equal(d0.solve_words(u0, x0), d1.solve_words(u0, x0))


def _lti_constrained(fused, **kw):
    from pint_tpu.mpc import (condense_double_integrator, constrain_states,
                              quantize_constrained)
    from pint_tpu.mpc.constrained import ConstrainedPGD

    T, dt = 12, 1.0 / 32.0
    qp = condense_double_integrator(T=T, dt=dt, q_pos=4.0)
    A = np.array([[1.0, dt], [0.0, 1.0]])
    Bm = np.array([[0.5 * dt * dt], [dt]])
    sc = constrain_states(
        qp, np.broadcast_to(A, (T, 2, 2)), np.broadcast_to(Bm, (T, 2, 1)),
        None, F=[[0.0, 1.0]], lo=-0.25, hi=0.25)
    return ConstrainedPGD(quantize_constrained(sc, rho=50.0),
                          outer=3, inners=8, fused=fused, **kw)


@pytest.mark.parametrize("block_rows", [4, 8, 5])  # 5: B=12 pads to 15
def test_shared_fused_lti_bit_identical(block_rows):
    s0 = _lti_constrained(False)
    s1 = _lti_constrained(True, block_rows=block_rows)
    B = 12
    rng = np.random.default_rng(2)
    x0 = np.stack([rng.uniform(-1.5, 1.5, B),
                   rng.uniform(-0.2, 0.2, B)], axis=-1)
    g = jnp.asarray(s0._q.g_lane_fixed(x0))
    co = jnp.asarray(s0.qcqp.c_off_pre(x0))
    u0 = s0.init_words(B)
    w0, l0 = jax.jit(s0.solve_words)(u0, g, co)
    w1, l1 = jax.jit(s1.solve_words)(u0, g, co)
    assert jnp.array_equal(w0, w1)
    assert jnp.array_equal(l0, l1)
    # warm multipliers (receding-horizon path)
    lam = jnp.asarray(rng.integers(0, 300, l0.shape, np.int32))
    w0, l0 = jax.jit(s0.solve_words)(u0, g, co, lam)
    w1, l1 = jax.jit(s1.solve_words)(u0, g, co, lam)
    assert jnp.array_equal(w0, w1)
    assert jnp.array_equal(l0, l1)


def test_auto_default_is_backend_gated(monkeypatch):
    """fused=None / lipq=None must resolve to the XLA paths off-TPU (no
    interpret-mode kernels in production CPU use) and to the Pallas
    kernels on TPU backends.  The execution paths are observed directly:
    the inner entry points and the lipq/pen kernels are wrapped with
    call recorders, and ``jax.default_backend`` is monkeypatched to
    simulate the TPU case (the kernels still run in interpret mode,
    forced by the spies, so results stay comparable)."""
    import pint_tpu.mpc.condense_fused as cf
    import pint_tpu.mpc.device_constrained as dc
    import pint_tpu.mpc.fused_alm as fa

    calls = []
    real_fused_pre = fa.alm_fused_words_pre
    real_xla = dc._alm_batched
    real_lipq = cf.lipq_fused
    real_pen = cf.pen_fused

    def spy_fused_pre(*a, **k):
        calls.append("fused")
        k["interpret"] = True
        return real_fused_pre(*a, **k)

    def spy_xla(*a, **k):
        calls.append("xla")
        return real_xla(*a, **k)

    def spy_lipq(*a, **k):
        calls.append("lipq")
        k["interpret"] = True
        return real_lipq(*a, **k)

    def spy_pen(*a, **k):
        calls.append("pen")
        k["interpret"] = True
        return real_pen(*a, **k)

    monkeypatch.setattr(fa, "alm_fused_words_pre", spy_fused_pre)
    monkeypatch.setattr(dc, "_alm_batched", spy_xla)
    monkeypatch.setattr(cf, "lipq_fused", spy_lipq)
    monkeypatch.setattr(cf, "pen_fused", spy_pen)

    B = 2
    x0 = np.array([[0.0, 0.0, 1.0]] * B, np.float32)
    devc = _mk()  # fused=None, cpu backend -> XLA inner, XLA epilogues
    w_auto, l_auto = devc.solve_words(devc.init_words(B), x0)
    assert "xla" in calls
    assert "fused" not in calls and "lipq" not in calls

    calls.clear()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    devc_tpu = _mk()  # fresh instance: every None flag now selects kernels
    devc_tpu.solve_words(devc_tpu.init_words(B), x0)
    assert "fused" in calls and "lipq" in calls and "pen" in calls
    assert "xla" not in calls


def _mesh(dp, tp):
    from pint_tpu.parallel import make_mesh

    return make_mesh(dp=dp, tp=tp)


def test_sharded_fused_device_sqp_bit_identical():
    """The fused PGD inner inside shard_map (dp-major mesh) reproduces the
    single-device fused solve word for word -- the VERDICT round-3 gap:
    production dp meshes must keep the fused per-chip rate."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    kw = dict(horizon=8, sqp_iters=2, pgd_iters=6,
              x_ref=np.array([1.0, 0.0, 0.0]))
    dev = DeviceSQP(**kw, fused=True, fused_block=8)
    B = 16
    rng = np.random.default_rng(17)
    x0 = np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32)
    u0 = dev.init_words(B)
    w_single = dev.solve_words(u0, x0)

    mesh = _mesh(8, 1)
    solve = dev.sharded_solve_words(mesh)
    xj = jax.device_put(jnp.asarray(x0), NamedSharding(mesh, P("dp", None)))
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    w_sh = solve(uj, xj)
    assert jnp.array_equal(w_single, w_sh)


def test_sharded_fused_constrained_bit_identical():
    """The fused ALM inner inside shard_map (dp-major mesh) reproduces the
    single-device fused constrained solve exactly (words AND
    multipliers)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    devc = _mk(fused=True, fused_block=8)
    B = 16
    rng = np.random.default_rng(19)
    x0 = np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(-np.pi, np.pi, B)], axis=-1).astype(np.float32)
    u0 = devc.init_words(B)
    w_single, l_single = devc.solve_words(u0, x0)

    mesh = _mesh(8, 1)
    solve = devc.sharded_solve_words(mesh)
    row = NamedSharding(mesh, P("dp", None))
    xj = jax.device_put(jnp.asarray(x0), row)
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    lj = jax.device_put(devc.init_lam(B), row)
    w_sh, l_sh = solve(uj, xj, lj)
    assert jnp.array_equal(w_single, w_sh)
    assert jnp.array_equal(l_single, l_sh)


def test_sharded_fused_flag_ignored_on_tp_meshes(monkeypatch):
    """fused=True on a tp>1 mesh must NOT take the one-launch fused
    inners (the per-iteration psums cannot live inside one kernel --
    the tp path uses the per-iteration matvec kernel instead,
    tests/test_condense_fused.py) and still match the single-device
    solve bit for bit."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import pint_tpu.mpc.fused_alm as fa

    def boom(*a, **k):
        raise AssertionError("fused inner must not run on tp>1 meshes")

    monkeypatch.setattr(fa, "alm_fused_words", boom)
    monkeypatch.setattr(fa, "pgd_fused_words", boom)

    devc = _mk(fused=True, fused_block=8)
    B = 8
    rng = np.random.default_rng(23)
    x0 = np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(-np.pi, np.pi, B)], axis=-1).astype(np.float32)
    u0 = devc.init_words(B)
    w_single, l_single = _mk(fused=False).solve_words(u0, x0)

    mesh = _mesh(2, 4)
    solve = devc.sharded_solve_words(mesh)
    row = NamedSharding(mesh, P("dp", None))
    xj = jax.device_put(jnp.asarray(x0), row)
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    lj = jax.device_put(devc.init_lam(B), row)
    w_sh, l_sh = solve(uj, xj, lj)
    assert jnp.array_equal(w_single, w_sh)
    assert jnp.array_equal(l_single, l_sh)
