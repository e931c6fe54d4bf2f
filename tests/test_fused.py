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
