"""Fused lipschitz+quantize kernel (mpc/condense_fused.py).

Contracts: (a) the kernel's quantization is elementwise-exact given its
own abs-max/lip outputs (the int8 Hessian equals the XLA recompute from
the kernel's h_max, bit for bit, in the kernel's orientation); (b) the
power-iteration Lipschitz tracks the XLA ``_lipschitz_phase`` to
roundoff; (c) with ``lipq=True`` the fused and XLA inners stay
bit-identical through full solves (the quantized operands come from ONE
kernel, so the inner choice cannot move ties); (d) the dp-sharded lipq
path reproduces the single-device lipq solve exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pint_tpu.mpc import DeviceSQP
from pint_tpu.mpc.condense_fused import lipq_fused

KW = dict(horizon=8, sqp_iters=2, pgd_iters=6,
          x_ref=np.array([1.0, 0.0, 0.0]))


@pytest.fixture(scope="module")
def ht_g():
    d = DeviceSQP(**KW)
    rng = np.random.default_rng(31)
    B = 12
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
    lanes = jnp.asarray(
        rng.integers(-100, 100, (B, d.n_dec), dtype=np.int32))
    Ht, g = jax.jit(d._condense_ht)(x0, lanes)
    return d, Ht, g


@pytest.mark.parametrize("block", [4, 8, 5])  # 5: B=12 pads to 15
def test_kernel_quantization_exact_given_own_scales(ht_g, block):
    d, Ht, g = ht_g
    hqt, lip, hmax = lipq_fused(
        Ht, power_iters=d.power_iters, block=block
    )
    # abs-max is order-independent: must match the XLA reduce bitwise
    np.testing.assert_array_equal(
        np.asarray(hmax), np.asarray(jnp.max(jnp.abs(Ht), axis=(0, 1)))
    )
    # int8 rounding is elementwise given hmax: recompute in XLA from the
    # kernel's own h_max and compare bitwise (kernel orientation:
    # hqt[k, j, b] = q(Ht[k, j, b]) -- contiguous writes; the inner
    # applies the quantized transpose of the symmetric H)
    expect = jnp.clip(
        jnp.round(Ht * (127.0 / hmax)[None, None, :]),
        -127, 127,
    ).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(hqt), np.asarray(expect))


def test_kernel_lip_tracks_xla_power_iteration(ht_g):
    d, Ht, g = ht_g
    _, lip, _ = lipq_fused(Ht, power_iters=d.power_iters, block=8)
    lip_xla = jax.jit(d._lipschitz_phase)(Ht)
    np.testing.assert_allclose(
        np.asarray(lip), np.asarray(lip_xla), rtol=1e-4
    )


def test_kernel_deterministic(ht_g):
    d, Ht, g = ht_g
    a = lipq_fused(Ht, power_iters=d.power_iters, block=8)
    b = lipq_fused(Ht, power_iters=d.power_iters, block=8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _x0(B, seed=41):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32)


def test_lipq_fused_vs_xla_inner_bit_identical():
    """With lipq=True the quantized operands come from one kernel, so the
    inner choice (Pallas vs XLA) must not change a single bit."""
    d_f = DeviceSQP(**KW, lipq=True, fused=True, fused_block=8,
                    lipq_block=8)
    d_x = DeviceSQP(**KW, lipq=True, fused=False, lipq_block=8)
    B = 6
    x0 = _x0(B)
    u0 = d_f.init_words(B)
    assert jnp.array_equal(
        d_f.solve_words(u0, x0), d_x.solve_words(u0, x0)
    )


def test_lipq_solution_quality_matches_xla_quantizer():
    """lipq's last-ulp lip differences may move int8 ties but not the
    solution quality: final true costs agree to a fraction of a percent."""
    from pint_tpu.mpc import QuantizedSQP

    kw = dict(horizon=32, sqp_iters=6, pgd_iters=40,
              Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
              qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
    host = QuantizedSQP(**kw)
    d_l = DeviceSQP(**kw, lipq=True, fused=False)
    d_x = DeviceSQP(**kw, lipq=False, fused=False)
    x0 = np.array([[0.0, 0.0, 0.0], [-0.1, 0.05, 0.1], [0.05, -0.1, 0.9]])
    u0 = d_l.init_words(x0.shape[0])
    wl = d_l.solve_words(u0, x0.astype(np.float32))
    wx = d_x.solve_words(u0, x0.astype(np.float32))
    cl = host.true_cost(x0, host.lanes(wl))
    cx = host.true_cost(x0, host.lanes(wx))
    np.testing.assert_allclose(cl, cx, rtol=0.01, atol=1e-4)


def test_sharded_lipq_bit_identical():
    """dp-sharded lipq+fused solve == single-device lipq+fused solve."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    dev = DeviceSQP(**KW, lipq=True, fused=True, fused_block=8,
                    lipq_block=8)
    B = 16
    x0 = _x0(B, seed=43)
    u0 = dev.init_words(B)
    w_single = dev.solve_words(u0, x0)

    mesh = make_mesh(dp=8, tp=1)
    solve = dev.sharded_solve_words(mesh)
    xj = jax.device_put(jnp.asarray(x0), NamedSharding(mesh, P("dp", None)))
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    assert jnp.array_equal(w_single, solve(uj, xj))


def test_sharded_lipq_tp_mesh_bit_identical():
    """lipq on a tp>1 mesh: the kernel-quantized operands feed the XLA
    column inner; must match the single-device lipq XLA-inner solve."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    dev = DeviceSQP(**KW, lipq=True, fused=False, lipq_block=8)
    B = 8
    x0 = _x0(B, seed=47)
    u0 = dev.init_words(B)
    w_single = dev.solve_words(u0, x0)

    mesh = make_mesh(dp=2, tp=4)
    solve = dev.sharded_solve_words(mesh)
    xj = jax.device_put(jnp.asarray(x0), NamedSharding(mesh, P("dp", None)))
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    assert jnp.array_equal(w_single, solve(uj, xj))


# -- pen_fused (constrained epilogue) ----------------------------------------

def _mk_con(**kw):
    from pint_tpu.mpc import DeviceConstrainedSQP

    return DeviceConstrainedSQP(
        DeviceSQP(horizon=8, sqp_iters=2, pgd_iters=6,
                  x_ref=np.array([1.0, 0.0, 0.0])),
        F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0, alm_outer=2,
        **kw,
    )


@pytest.fixture(scope="module")
def s_stack():
    devc = _mk_con()
    d = devc.dev
    rng = np.random.default_rng(53)
    B = 12
    x0 = jnp.asarray(_x0(B, seed=53))
    lanes = jnp.asarray(
        rng.integers(-100, 100, (B, d.n_dec), dtype=np.int32))

    def stack(x0_f, lanes):
        A_seq, B_lane, c_seq = d._linearize_phase(x0_f, lanes)
        Abar, Bbar_all, Cbar = d._propagate_scan(A_seq, B_lane, c_seq)
        return devc._stack_constraints(Abar, Bbar_all, Cbar)

    S_t, _, _ = jax.jit(stack)(x0, lanes)
    return devc, S_t


@pytest.mark.parametrize("block", [4, 8, 5])
def test_pen_kernel_quantization_exact_given_own_scale(s_stack, block):
    from pint_tpu.mpc.condense_fused import pen_fused

    devc, S_t = s_stack
    sqc, sqj, pen_lip, s_scale, row_amp = pen_fused(
        S_t, power_iters=devc.dev.power_iters, block=block
    )
    # max-abs is order-independent: bitwise equal to the XLA reduce
    sm = jnp.max(jnp.abs(S_t), axis=(0, 1))
    np.testing.assert_array_equal(
        np.asarray(s_scale), np.asarray(sm / 127.0)
    )
    # recompute with the kernel's exact multiply form (127/max|S|)
    exp_c = jnp.clip(
        jnp.round(S_t * (127.0 / sm)[None, None, :]), -127, 127
    ).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(sqc), np.asarray(exp_c))
    np.testing.assert_array_equal(
        np.asarray(sqj), np.asarray(jnp.swapaxes(exp_c, 0, 1))
    )
    # sum order differs from XLA's tree reduce: allclose, not bitwise
    np.testing.assert_allclose(
        np.asarray(row_amp),
        np.asarray(127.0 * jnp.max(jnp.sum(jnp.abs(S_t), axis=1), axis=0)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pen_lip),
        np.asarray(jax.jit(devc._pen_lipschitz)(S_t)),
        rtol=1e-4,
    )


def test_constrained_lipq_fused_vs_xla_inner_bit_identical():
    devc_f = _mk_con(lipq=True, fused=True, fused_block=8, lipq_block=8)
    devc_x = _mk_con(lipq=True, fused=False, lipq_block=8)
    B = 6
    x0 = _x0(B, seed=59)
    u0 = devc_f.init_words(B)
    w1, l1 = devc_f.solve_words(u0, x0)
    w2, l2 = devc_x.solve_words(u0, x0)
    assert jnp.array_equal(w1, w2)
    assert jnp.array_equal(l1, l2)


def test_constrained_lipq_solution_quality():
    """lipq vs XLA quantizer: same inputs, costs and violations agree to
    quantization tolerance (ties may move, quality must not)."""
    devc_l = _mk_con(lipq=True, fused=False, lipq_block=8)
    devc_x = _mk_con(lipq=False, fused=False)
    B = 6
    x0 = _x0(B, seed=61)
    u0 = devc_l.init_words(B)
    wl, _ = devc_l.solve_words(u0, x0)
    wx, _ = devc_x.solve_words(u0, x0)
    from pint_tpu.models.dynamics import unpack_controls

    d = devc_l.dev
    ll = np.asarray(unpack_controls(wl))[:, : d.n_dec]
    lx = np.asarray(unpack_controls(wx))[:, : d.n_dec]
    vl = devc_l.violation(x0, ll)
    vx = devc_x.violation(x0, lx)
    np.testing.assert_allclose(vl, vx, atol=5e-3)


def test_sharded_constrained_lipq_bit_identical():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    devc = _mk_con(lipq=True, fused=True, fused_block=8, lipq_block=8)
    B = 16
    x0 = _x0(B, seed=67)
    u0 = devc.init_words(B)
    w_single, l_single = devc.solve_words(u0, x0)

    mesh = make_mesh(dp=8, tp=1)
    solve = devc.sharded_solve_words(mesh)
    row = NamedSharding(mesh, P("dp", None))
    xj = jax.device_put(jnp.asarray(x0), row)
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    lj = jax.device_put(devc.init_lam(B), row)
    w_sh, l_sh = solve(uj, xj, lj)
    assert jnp.array_equal(w_single, w_sh)
    assert jnp.array_equal(l_single, l_sh)


def test_sharded_constrained_lipq_tp_mesh_bit_identical():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    devc = _mk_con(lipq=True, fused=False, lipq_block=8)
    B = 8
    x0 = _x0(B, seed=71)
    u0 = devc.init_words(B)
    w_single, l_single = devc.solve_words(u0, x0)

    mesh = make_mesh(dp=2, tp=4)
    solve = devc.sharded_solve_words(mesh)
    row = NamedSharding(mesh, P("dp", None))
    xj = jax.device_put(jnp.asarray(x0), row)
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    lj = jax.device_put(devc.init_lam(B), row)
    w_sh, l_sh = solve(uj, xj, lj)
    assert jnp.array_equal(w_single, w_sh)
    assert jnp.array_equal(l_single, l_sh)


def test_vmem_viability_gating():
    """Kernel auto-selection degrades gracefully with horizon: geometries
    whose slabs cannot fit PHYSICAL VMEM (the raised-limit ceiling --
    v5e has 128 MB/core; the ~16 MB figure is Mosaic's default scoped
    limit, exp_vmem_ceiling.py) at the minimum native block (128
    trailing columns, a Pallas TPU requirement) must not select the
    kernels even when the flag is forced on."""
    from pint_tpu.mpc import DeviceConstrainedSQP
    from pint_tpu.mpc.condense_fused import lipq_viable
    from pint_tpu.mpc.fused_alm import alm_viable, pgd_viable

    assert lipq_viable(128)                # T=64 unicycle (21 MB)
    assert lipq_viable(256)                # T=128 unicycle (84 MB)
    assert not lipq_viable(320)            # 131 MB: over physical VMEM
    assert pgd_viable(256) and pgd_viable(632)
    assert not pgd_viable(640)

    d64 = DeviceSQP(horizon=64, lipq=True, fused=True)
    assert d64._use_fused() and d64._use_lipq()
    d128 = DeviceSQP(horizon=128, model=__import__(
        "pint_tpu.models", fromlist=["Pendulum"]).Pendulum(),
        Q=np.eye(2), R=np.array([[0.1]]), x_ref=np.zeros(2),
        lipq=True, fused=True)
    assert d128._use_fused() and d128._use_lipq()
    # past the lipq ceiling the kernel must drop out even when forced
    d640 = DeviceSQP(horizon=320, lipq=True, fused=True)
    assert not d640._use_lipq() and not d640._use_fused()

    c = DeviceConstrainedSQP(
        DeviceSQP(horizon=32, lipq=True, fused=True),
        F=[[0.0, 1.0, 0.0]], lipq=True, fused=True)
    assert c._use_fused() and c._use_lipq()
    assert alm_viable(256, 128) and not alm_viable(512, 256)


def test_fused_auto_requires_lipq(monkeypatch):
    """Determinism gate (VERDICT r4 weak #1): on auto (``fused=None``)
    the kernel inner is selected ONLY where the lipq kernel -- the
    carrier of the fused-vs-XLA full-solve bit-identity -- also runs.
    The measured-divergent combination (kernel inner, XLA quantize) must
    require explicit ``fused=True, lipq=False``."""
    import pint_tpu.mpc.fused_alm as fa

    monkeypatch.setattr(fa, "on_tpu_backend", lambda: True)

    auto = DeviceSQP(horizon=64)                    # Tm=128: both viable
    assert auto._use_lipq() and auto._use_fused()
    # explicitly disabling lipq silently disables the auto fused inner
    no_lipq = DeviceSQP(horizon=64, lipq=False)
    assert not no_lipq._use_lipq() and not no_lipq._use_fused()
    # ... and the divergent pair stays reachable only explicitly
    forced = DeviceSQP(horizon=64, lipq=False, fused=True)
    assert forced._use_fused() and not forced._use_lipq()

    # a geometry where the inner fits but lipq does not (Tm=640 needs
    # pendulum-class m=1 to keep pgd_viable True): auto fused gates OFF
    # with lipq rather than silently entering the divergent mode
    from pint_tpu.models import Pendulum

    big = DeviceSQP(horizon=400, model=Pendulum(), Q=np.eye(2),
                    R=np.array([[0.1]]), x_ref=np.zeros(2))
    from pint_tpu.mpc.condense_fused import lipq_viable
    from pint_tpu.mpc.fused_alm import pgd_viable

    assert pgd_viable(big.n_dec) and not lipq_viable(big.n_dec)
    assert not big._use_lipq() and not big._use_fused()
    # explicit opt-in still honored there
    assert DeviceSQP(horizon=400, model=Pendulum(), Q=np.eye(2),
                     R=np.array([[0.1]]), x_ref=np.zeros(2),
                     fused=True)._use_fused()


def test_tp_matvec_crossover_gate(monkeypatch):
    """tp>1 fused auto-selection keys on the measured kernel-vs-XLA
    crossover (EXP_MATVEC_SWEEP: kernel wins at every K>=16
    columns/rank, washes at K=8), while an explicit flag is honored
    wherever viable."""
    import pint_tpu.mpc.fused_alm as fa
    from pint_tpu.mpc.fused_alm import (
        matvec_viable, matvec_wins, resolve_tp_fused,
    )

    assert matvec_viable(8, 96) and matvec_viable(48, 96)
    assert matvec_wins(48, 96)             # tp=2 at Tm=96: kernel wins
    assert matvec_wins(16, 96)             # sweep: wins at every K>=16
    assert not matvec_wins(8, 96)          # K=8: measured wash/loss

    monkeypatch.setattr(fa, "on_tpu_backend", lambda: True)
    assert resolve_tp_fused(None, 48, 96, True)
    assert not resolve_tp_fused(None, 8, 96, True)   # auto: XLA dot
    # auto also requires the lipq determinism carrier (the tp==1 rule):
    # without it, per-iteration custom calls could compile the f32
    # condensation differently from the single-device program
    assert not resolve_tp_fused(None, 48, 96, False)
    assert resolve_tp_fused(True, 8, 96, False)      # explicit: kernel
    assert not resolve_tp_fused(False, 48, 96, True)


@pytest.mark.parametrize("lipq_flag", [False, True])
def test_tp_fused_matvec_bit_identical(lipq_flag):
    """tp>1 sharded solve with the per-iteration matvec kernel (fused
    column path) reproduces the single-device fused solve word for word:
    int32 accumulation is wrap-exact, so the kernel matvec + psum equals
    the XLA batched dot + psum bit for bit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    dev = DeviceSQP(**KW, fused=True, fused_block=8,
                    lipq=lipq_flag, lipq_block=8)
    B = 8
    x0 = _x0(B, seed=73)
    u0 = dev.init_words(B)
    w_single = dev.solve_words(u0, x0)

    mesh = make_mesh(dp=2, tp=4)
    solve = dev.sharded_solve_words(mesh)
    xj = jax.device_put(jnp.asarray(x0), NamedSharding(mesh, P("dp", None)))
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    assert jnp.array_equal(w_single, solve(uj, xj))


@pytest.mark.parametrize("lipq_flag", [False, True])
def test_tp_fused_constrained_bit_identical(lipq_flag):
    """tp>1 sharded constrained solve with the per-iteration combined
    matvec kernel reproduces the single-device fused solve exactly
    (words AND multipliers)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    devc = _mk_con(fused=True, fused_block=8,
                   lipq=lipq_flag, lipq_block=8)
    B = 8
    x0 = _x0(B, seed=79)
    u0 = devc.init_words(B)
    w_single, l_single = devc.solve_words(u0, x0)

    mesh = make_mesh(dp=2, tp=4)
    solve = devc.sharded_solve_words(mesh)
    row = NamedSharding(mesh, P("dp", None))
    xj = jax.device_put(jnp.asarray(x0), row)
    uj = jax.device_put(u0, NamedSharding(mesh, P("dp", "tp")))
    lj = jax.device_put(devc.init_lam(B), row)
    w_sh, l_sh = solve(uj, xj, lj)
    assert jnp.array_equal(w_single, w_sh)
    assert jnp.array_equal(l_single, l_sh)


def test_vmem_kwargs_tiers():
    """Working sets within the default Mosaic budget compile with no
    params (round-4-identical); above it they pass the raised
    vmem_limit_bytes; interpret mode never passes params."""
    from pint_tpu.mpc.fused_alm import (
        _vmem_kwargs, _VMEM_BUDGET, _VMEM_LIMIT_BYTES,
    )

    assert _vmem_kwargs(_VMEM_BUDGET, False) == {}
    kw = _vmem_kwargs(_VMEM_BUDGET + 1, False)
    assert kw["compiler_params"].vmem_limit_bytes == _VMEM_LIMIT_BYTES
    assert _vmem_kwargs(10**9, True) == {}
