"""Fused Pallas PGD solver: bit-identical to the word-space solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pint_tpu.mpc import FixedPointPGD, condense_double_integrator, quantize
from pint_tpu.mpc.fused import FusedPGD


@pytest.fixture(scope="module")
def qqp():
    return quantize(condense_double_integrator(T=50))


def test_word_lane_roundtrip():
    from pint_tpu.models.dynamics import pack_controls, unpack_controls

    rng = np.random.default_rng(0)
    lanes = rng.integers(-128, 128, size=(32, 64), dtype=np.int32)
    words = pack_controls(jnp.asarray(lanes))
    back = unpack_controls(words)
    np.testing.assert_array_equal(np.asarray(back), lanes)


@pytest.mark.parametrize("batch", [16, 100, 512])
def test_fused_matches_reference_solver(qqp, batch):
    iters = 30
    fused = FusedPGD(qqp, iters=iters, block_rows=128, interpret=True)
    word_solver = FixedPointPGD(qqp, iters=iters)

    rng = np.random.default_rng(1)
    x0 = np.stack(
        [rng.uniform(-3, 3, batch), rng.uniform(-1, 1, batch)], axis=-1
    )
    g = jnp.asarray(qqp.g_lane_fixed(x0))
    u0 = fused.init_words(batch)

    got = fused.solve_words(u0, g)
    expected = jax.jit(word_solver.solve_words)(u0, g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


@pytest.mark.parametrize("batch", [16, 128])
def test_packed_io_matches_reference(qqp, batch):
    iters = 25
    fused = FusedPGD(
        qqp, iters=iters, block_rows=64, packed_io=True, interpret=True
    )
    word_solver = FixedPointPGD(qqp, iters=iters)
    rng = np.random.default_rng(3)
    x0 = np.stack(
        [rng.uniform(-3, 3, batch), rng.uniform(-1, 1, batch)], axis=-1
    )
    g = jnp.asarray(qqp.g_lane_fixed(x0))
    u0 = fused.init_words(batch)
    got = fused.solve_words(u0, g)
    expected = jax.jit(word_solver.solve_words)(u0, g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_dp_sharded_fused_matches(qqp):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pint_tpu.parallel import make_mesh

    mesh = make_mesh(dp=8, tp=1)
    fused = FusedPGD(qqp, iters=20, block_rows=32, interpret=True)
    batch = 64
    rng = np.random.default_rng(5)
    x0 = np.stack(
        [rng.uniform(-3, 3, batch), rng.uniform(-1, 1, batch)], axis=-1
    )
    g = jnp.asarray(qqp.g_lane_fixed(x0))
    u0 = fused.init_words(batch)
    sh = NamedSharding(mesh, P("dp", None))
    out = fused.dp_sharded(mesh)(
        jax.device_put(u0, sh), jax.device_put(g, sh)
    )
    ref = jax.jit(FixedPointPGD(qqp, iters=20).solve_words)(u0, g)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert len(out.sharding.device_set) == 8
