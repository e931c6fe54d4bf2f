"""Standalone repro for the Mosaic 16-lane concat/slice miscompile.

This is the toolchain bug that gates ``FusedPGD(packed_io=True)`` to
interpret mode (pint_tpu/mpc/fused.py:72-83): inside a Pallas TPU kernel,
unpacking SWAR words via shifted copies + a lane-axis ``concatenate`` with
sub-tile (16-lane) pieces, then repacking, is NOT the identity on hardware
— lane-2 bytes of odd word columns come back zeroed (first seen 2026-08-17
on v5e).  Run this after every toolchain bump:

    python - < mosaic_repro.py          # from the repo root, on TPU

Exit code 0 = every variant correct (the packed_io gate can be lifted);
nonzero = the gate must stay.  The script also measures the shuffle-free
PLANAR alternative (separate lane planes on a leading axis, no concat, no
sub-tile slice) so the fix path is quantified, not hypothetical.

Variants:
  A. grouped concat unpack -> repack identity   (the known miscompile)
  B. planar unpack (out[k] = lane-k plane)      (shuffle-free alternative)
  C. planar repack (words from planar planes)   (inverse of B)
  D. B+C fused identity                          (what packed_io would use)
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

R, C = 256, 64  # words tile: R rows x C uint32 words (4 int8 lanes each)


def _words(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 32, size=(R, C), dtype=np.uint64).astype(
        np.uint32
    )


def _unpack_grouped(w_i32):
    """Shifted-copy unpack to grouped lane order via CONCAT (variant A)."""
    return jnp.concatenate(
        [
            jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(w_i32, jnp.int32(24 - 8 * k)),
                jnp.int32(24),
            )
            for k in range(4)
        ],
        axis=1,
    )  # (R, 4C)


def kernel_concat_identity(w_ref, out_ref):
    """Variant A: grouped unpack (concat) -> repack.  Identity iff correct."""
    w = jax.lax.bitcast_convert_type(w_ref[:], jnp.int32)
    lanes = _unpack_grouped(w)                       # (R, 4C)
    out = jnp.zeros((R, C), jnp.int32)
    for k in range(4):
        blk = lanes[:, k * C : (k + 1) * C]          # sub-tile static slice
        out = out | jax.lax.shift_left(blk & jnp.int32(0xFF), jnp.int32(8 * k))
    out_ref[:] = jax.lax.bitcast_convert_type(out, jnp.uint32)


def kernel_planar_unpack(w_ref, out_ref):
    """Variant B: planar lane planes on a leading axis -- no concat, no
    sub-tile slicing; each plane is a full (R, C) tile write."""
    w = jax.lax.bitcast_convert_type(w_ref[:], jnp.int32)
    for k in range(4):
        out_ref[k] = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, jnp.int32(24 - 8 * k)), jnp.int32(24)
        )


def kernel_planar_pack(p_ref, out_ref):
    """Variant C: repack words from planar planes."""
    out = jnp.zeros((R, C), jnp.int32)
    for k in range(4):
        out = out | jax.lax.shift_left(
            p_ref[k] & jnp.int32(0xFF), jnp.int32(8 * k)
        )
    out_ref[:] = jax.lax.bitcast_convert_type(out, jnp.uint32)


def kernel_planar_identity(w_ref, out_ref):
    """Variant D: B+C fused -- the shuffle-free packed-I/O building block."""
    w = jax.lax.bitcast_convert_type(w_ref[:], jnp.int32)
    planes = [
        jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, jnp.int32(24 - 8 * k)), jnp.int32(24)
        )
        for k in range(4)
    ]
    out = jnp.zeros((R, C), jnp.int32)
    for k in range(4):
        out = out | jax.lax.shift_left(
            planes[k] & jnp.int32(0xFF), jnp.int32(8 * k)
        )
    out_ref[:] = jax.lax.bitcast_convert_type(out, jnp.uint32)


def run(name, kernel, out_shape, w, expect, project=None):
    """Compile natively, execute, compare; returns (ok, message)."""
    with jax.numpy_dtype_promotion("standard"), jax.enable_x64(False):
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(*out_shape),
                interpret=False,
            )
            got = np.asarray(jax.jit(fn)(jnp.asarray(w)))
        except Exception as e:  # compile/execute failure is also a data point
            return False, f"{name}: RAISED {type(e).__name__}: {e}"
    if project is not None:
        got = project(got)
    if (got == expect).all():
        return True, f"{name}: OK (bit-exact identity)"
    bad = np.argwhere(got != expect)
    r0, c0 = bad[0][:2]
    return False, (
        f"{name}: MISCOMPILE -- {len(bad)} mismatched words; first at "
        f"row {r0} col {c0}: got {got[tuple(bad[0])]:#010x} "
        f"want {expect[tuple(bad[0])]:#010x}"
    )


def main():
    if jax.default_backend() not in ("tpu", "axon"):
        print("not on TPU -- this repro only means something natively")
        return 0

    w = _words(0)
    results = []

    results.append(run(
        "A concat-identity", kernel_concat_identity, ((R, C), jnp.uint32),
        w, w,
    ))

    # B: planar unpack vs numpy reference
    planes_ref = np.stack(
        [((w >> (8 * k)) & 0xFF).astype(np.int8).astype(np.int32)
         for k in range(4)]
    )
    results.append(run(
        "B planar-unpack", kernel_planar_unpack, ((4, R, C), jnp.int32),
        w, planes_ref,
    ))

    # C: planar pack from B's reference planes
    with jax.enable_x64(False):
        try:
            fn = pl.pallas_call(
                kernel_planar_pack,
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
                interpret=False,
            )
            got = np.asarray(jax.jit(fn)(jnp.asarray(planes_ref)))
            ok = (got == w).all()
            results.append((bool(ok), f"C planar-pack: {'OK' if ok else 'MISCOMPILE'}"))
        except Exception as e:
            results.append((False, f"C planar-pack: RAISED {e}"))

    results.append(run(
        "D planar-identity", kernel_planar_identity, ((R, C), jnp.uint32),
        w, w,
    ))

    for ok, msg in results:
        print(("PASS " if ok else "FAIL ") + msg)
    a_ok = results[0][0]
    planar_ok = all(ok for ok, _ in results[1:])
    if a_ok:
        print("concat shuffle FIXED in this toolchain -> the "
              "FusedPGD(packed_io=True) native gate (fused.py) can be "
              "re-evaluated")
    if planar_ok and not a_ok:
        print("planar variants are correct -> a shuffle-free packed_io "
              "rewrite is viable (planes on the leading axis)")
    return 0 if a_ok and planar_ok else 1


if __name__ == "__main__":
    sys.exit(main())
