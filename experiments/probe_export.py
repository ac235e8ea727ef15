"""Feasibility probe: can the fused int8c serving step be serialized with
``jax.export`` (StableHLO + Mosaic custom calls) and reloaded without
rebuilding the engine?

Result (recorded in STATUS.md): see stdout of a run on the v5e chip.
"""

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    batch, num_pts = 16, 450
    cutout_kwargs = dict(
        fixed=True, centered=True, window_width=1.0, window_depth=0.5,
        num_cutout_pts=56, padding_val=29.99, area_mode=True,
        gather_mode="matmul",
    )
    model = FlowDrow(window_size=11, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 56))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1, num_pts)),
                           train=False)
    rng = np.random.default_rng(0)
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, num_pts)),
                       dtype=jnp.float32)
    v3 = make_serve_step_v3(model, variables, cutout_kwargs,
                            calib_scans=np.asarray(scan[:8]),
                            num_pts=num_pts, precision="int8c", tile=128)

    carry, out = v3(None, scan)
    print("direct call ok, outputs:", sorted(out))

    from jax import export as jexport

    exp = jexport.export(jax.jit(v3.raw_step))(carry, scan)
    blob = exp.serialize()
    print(f"serialized: {len(blob)/1e6:.2f} MB")

    carry2, out2 = jexport.deserialize(blob).call(carry, scan)
    # compare compiled-vs-compiled (eager raw_step would differ by fusion)
    _, want = jax.jit(v3.raw_step)(carry, scan)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(out2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("roundtrip bit-identical: OK")


if __name__ == "__main__":
    main()
