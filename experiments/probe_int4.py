"""Feasibility probe: int4 matmul on the v5e MXU via Pallas.

The serving head runs at ~80% of its 4.28 ms int8 MXU bound and is the
dominant step cost. If the MXU ran int4 x int4 (or int4 x int8) at 2x
int8 throughput, the head bound would halve. This probe times a
(rows, 768) @ (768, 256) dot — the head's conv shape — with int8 and
int4 operand dtypes inside a Pallas kernel, plus a correctness check.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_int4.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_mm(dtype, rows, k, n, reps):
    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((x_ref.shape[0], n), jnp.int32)
        for _ in range(reps):
            acc += jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[:] = acc

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, n), jnp.int32),
            in_specs=[pl.BlockSpec((rows, k), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, n), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(x.astype(dtype), w.astype(dtype))

    return run


def main():
    rows, k, n, reps = 2048, 768, 256, 64
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(-7, 8, (rows, k)), jnp.int8)
    wi = jnp.asarray(rng.integers(-7, 8, (k, n)), jnp.int8)
    ref = np.asarray(xi, np.int32) @ np.asarray(wi, np.int32)

    for name, dtype in (("int8", jnp.int8), ("int4", jnp.int4)):
        try:
            run = make_mm(dtype, rows, k, n, reps)
            out = run(xi, wi)
            jax.block_until_ready(out)
            ok = np.array_equal(np.asarray(out), ref * reps)
            t0 = time.perf_counter()
            for _ in range(20):
                out = run(xi, wi)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / 20 * 1e3
            tops = 2 * rows * k * n * reps / (ms / 1e3) / 1e12
            print(f"{name}: {ms:7.3f} ms  {tops:6.1f} TOPS  "
                  f"correct={ok}")
        except Exception as e:
            print(f"{name}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
