"""Fused Pallas PGD solver: bit-identical to the word-space solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pint_tpu.mpc import FixedPointPGD, condense_double_integrator, quantize
from pint_tpu.mpc.fused import FusedPGD, _pack_lanes_u32, _unpack_lanes_u32


@pytest.fixture(scope="module")
def qqp():
    return quantize(condense_double_integrator(T=50))


def test_lane_pack_unpack_helpers():
    rng = np.random.default_rng(0)
    lanes = rng.integers(-128, 128, size=(32, 64), dtype=np.int32)
    words = _pack_lanes_u32(jnp.asarray(lanes))
    back = _unpack_lanes_u32(words)
    np.testing.assert_array_equal(np.asarray(back), lanes)
    # agreement with the word-level pack
    from pint_tpu.models.dynamics import pack_controls

    expected_words = pack_controls(jnp.asarray(lanes))
    np.testing.assert_array_equal(np.asarray(words), np.asarray(expected_words))


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
