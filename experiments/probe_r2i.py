"""TPU probe r2i: int8 row-shift via int32 bitcast byte-shifts.

Mosaic's sublane rotate is 32-bit only, so int8 activations could not be
tap-shifted in-kernel (round-1 fell back to rolling int32 accumulators,
3 matmuls at contraction Cin). If (rows, C) int8 bitcast to (rows/4, C)
int32 packs 4 consecutive ROWS per element, a shift-by-one-row is 2 int
shifts + or + a sublane roll — enabling a single concat-tap int8 matmul
at 3x contraction depth.

This probe checks the packing order and validates shifted outputs.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, C = 32, 128


def _kernel(x_ref, packed_ref, down_ref, up_ref):
    x = x_ref[:]  # (ROWS, C) int8
    xp = pltpu.bitcast(x, jnp.int32)  # (ROWS//4, C)
    packed_ref[:] = xp

    r4 = xp.shape[0]
    # down[r] = x[r-1] (shift rows down by 1, row 0 <- wrap)
    prev = pltpu.roll(xp, 1, axis=0)
    down = (xp << 8) | ((prev >> 24) & 0xFF)
    down_ref[:] = pltpu.bitcast(down, jnp.int8)
    # up[r] = x[r+1]
    nxt = pltpu.roll(xp, r4 - 1, axis=0)
    up = ((xp >> 8) & 0x00FFFFFF) | (nxt << 24)
    up_ref[:] = pltpu.bitcast(up, jnp.int8)


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (ROWS, C)).astype(np.int8)
    xj = jnp.asarray(x)
    packed, down, up = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ROWS // 4, C), jnp.int32),
            jax.ShapeDtypeStruct((ROWS, C), jnp.int8),
            jax.ShapeDtypeStruct((ROWS, C), jnp.int8),
        ),
    )(xj)
    packed = np.asarray(packed)
    # hypothesis: element (s, c) = x[4s, c] | x[4s+1, c]<<8 | ...
    expect_le = (x.astype(np.uint8).astype(np.uint32).reshape(8, 4, C)
                 * (1 << (8 * np.arange(4)))[None, :, None]).sum(1)
    le_match = np.array_equal(packed.astype(np.uint32), expect_le)
    print("packing little-endian-rows:", le_match)
    if not le_match:
        expect_be = (x.astype(np.uint8).astype(np.uint32).reshape(8, 4, C)
                     * (1 << (8 * np.arange(3, -1, -1)))[None, :, None]
                     ).sum(1)
        print("packing big-endian-rows:",
              np.array_equal(packed.astype(np.uint32), expect_be))

    down_ok = np.array_equal(np.asarray(down)[1:], x[:-1])
    up_ok = np.array_equal(np.asarray(up)[:-1], x[1:])
    print("down-shift ok (rows 1..):", down_ok)
    print("up-shift ok (rows ..-1):", up_ok)


if __name__ == "__main__":
    main()
