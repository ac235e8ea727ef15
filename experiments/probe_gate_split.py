"""Gate split probe: attention (per-stream kernel writing attn_i8/z/sim)
+ uniform mix kernel vs the fused pm gate, serving shapes B=128."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from planar_optical_flow_tpu.infer import fast_gate as fg

S, ct, l4, zdim, win = 128, 480, 14, 128, 11
tile = 160
rng = np.random.default_rng(0)
zx = jnp.asarray(rng.normal(size=(S * ct, zdim)), jnp.bfloat16)
zt = jnp.asarray(rng.normal(size=(S * ct, zdim)), jnp.bfloat16)
x_q = jnp.asarray(rng.integers(-127, 128, (S * 3 * l4 * tile, 256)), jnp.int8)
t_q = jnp.asarray(rng.integers(-127, 128, (S * 3 * l4 * tile, 256)), jnp.int8)
kw = dict(ct=ct, tile=tile, l4=l4, alpha=0.5, window_size=win,
          s_x=0.03, s_t=0.05, s_out=0.05, ct_valid=450)

g = jax.jit(lambda a, b, c, d: fg.gate_fused_int8_pm(a, b, c, d, **kw))
o = g(zx, zt, x_q, t_q); float(o[2][0, 0])
t0 = time.perf_counter()
for _ in range(30):
    o = g(zx, zt, o[0] if False else x_q, t_q)
float(o[2][0, 0])  # scalar readback: this backend's block_until_ready is lazy
print(f"fused gate: {(time.perf_counter()-t0)/30*1000:.3f} ms")

# ---- split version
from planar_optical_flow_tpu.ops.pallas.serve_cell import _attention

def attn_kernel(zx_ref, zt_ref, ai_ref, z_ref, sim_ref, *, hw, alpha,
                ct, ct_valid):
    zxf = zx_ref[0].astype(jnp.float32)
    ztb = zt_ref[0]
    attn_d, sim = _attention(zxf, ztb.astype(jnp.float32), hw, ct, ct_valid)
    ai_ref[0] = jnp.clip(jnp.rint(attn_d * 127.0), -127, 127).astype(jnp.int8)
    zmix = jax.lax.dot_general(attn_d.astype(jnp.bfloat16), ztb,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    z_ref[0] = (0.5 * zxf + 0.5 * zmix).astype(z_ref.dtype)
    sim_ref[0] = sim

def mix_kernel(ai_ref, x_ref, t_ref, out_ref, *, ct, alpha, s_x, s_t, s_out):
    t = t_ref[:].reshape(ct, -1)
    mixed32 = jax.lax.dot_general(ai_ref[0], t, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    mixed = mixed32.astype(jnp.float32) * (s_t / 127.0)
    x = x_ref[:].reshape(ct, -1).astype(jnp.float32) * s_x
    new_t = alpha * x + (1.0 - alpha) * mixed
    out_ref[:] = jnp.clip(jnp.rint(new_t / s_out), -127, 127
                          ).astype(jnp.int8).reshape(out_ref.shape)

zspec = pl.BlockSpec((1, ct, zdim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
aspec1 = pl.BlockSpec((1, ct, ct), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
attn_call = pl.pallas_call(
    functools.partial(attn_kernel, hw=win // 2, alpha=0.5, ct=ct,
                      ct_valid=450),
    grid=(S,),
    in_specs=[zspec, zspec],
    out_specs=(aspec1, zspec,
               pl.BlockSpec((1, ct, win), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)),
    out_shape=(jax.ShapeDtypeStruct((S, ct, ct), jnp.int8),
               jax.ShapeDtypeStruct((S, ct, zdim), jnp.bfloat16),
               jax.ShapeDtypeStruct((S, ct, win), jnp.float32)),
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024),
)
t_blocks = ct // tile
dspec = pl.BlockSpec((1, t_blocks, 1, tile, 256), lambda i, j: (i, 0, j, 0, 0),
                     memory_space=pltpu.VMEM)
mix_call = pl.pallas_call(
    functools.partial(mix_kernel, ct=ct, alpha=0.5, s_x=0.03, s_t=0.05,
                      s_out=0.05),
    grid=(S, l4),
    in_specs=[pl.BlockSpec((1, ct, ct), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM), dspec, dspec],
    out_specs=dspec,
    out_shape=jax.ShapeDtypeStruct((S, t_blocks, l4, tile, 256), jnp.int8),
    input_output_aliases={2: 0},
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024),
)

def split(zx, zt, x_q, t_q):
    zx5 = zx.reshape(S, ct, zdim)
    zt5 = zt.reshape(S, ct, zdim)
    ai, z, sim = attn_call(zx5, zt5)
    x5 = x_q.reshape(S, t_blocks, l4, tile, 256)
    t5 = t_q.reshape(S, t_blocks, l4, tile, 256)
    new_t = mix_call(ai, x5, t5)
    return new_t, z, sim

gs = jax.jit(split)
o2 = gs(zx, zt, x_q, t_q); float(o2[2][0, 0, 0])
t0 = time.perf_counter()
for _ in range(30):
    o2 = gs(zx, zt, x_q, t_q)
float(o2[2][0, 0, 0])
print(f"split gate: {(time.perf_counter()-t0)/30*1000:.3f} ms")
nt_f = np.asarray(o[0])
nt_s = np.asarray(o2[0]).reshape(nt_f.shape)
d = np.abs(nt_f.astype(np.int32) - nt_s.astype(np.int32))
print("template maxdiff", d.max(), "frac", (d > 0).mean())
