"""Bisect which output of packed_output_head kills the Mosaic lowering."""
import functools, os, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
n, hp, wp, r, c, co, th = 2, 32, 32, 4, 8, 3, 8
sc, qco = r*r*c, r*r*co
n_tiles = hp // th
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(n, hp, wp, sc), jnp.bfloat16)
wd = jnp.asarray(rs.randn(9, sc, qco), jnp.bfloat16)
bias = jnp.asarray(rs.randn(1, qco), jnp.float32)

def kernel(xp, xc, xn, w_ref, b_ref, *outs_and_scratch):
    acc = outs_and_scratch[-1]
    outs = outs_and_scratch[:-1]
    i = pl.program_id(1)
    xcat = jnp.concatenate([xp[0], xc[0], xn[0]], axis=0)
    xpad = jnp.concatenate([jnp.zeros((th+2, 1, sc), xcat.dtype), xcat,
                            jnp.zeros((th+2, 7, sc), xcat.dtype)], axis=1)
    acc[...] = jnp.zeros_like(acc)
    for t in range(9):
        sh, sw = divmod(t, 3)
        xs = xpad[sh:sh+th, sw:sw+wp]
        acc[...] += jax.lax.dot_general(
            xs.reshape(th*wp, sc), w_ref[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(th, wp, qco)
    y = acc[...] + b_ref[0]
    pos = 0
    if mode in ("full", "pool"):
        t_ = jnp.tanh(y)
        p = t_[:, :, 0:co]
        for q in range(1, r*r):
            p = p + t_[:, :, q*co:(q+1)*co]
        outs[pos][0] = (p * (1.0/(r*r))).astype(outs[pos].dtype); pos += 1
    if mode in ("full", "edges", "tb"):
        @pl.when(i == 0)
        def _t(): outs[pos][0] = y[0:1].astype(outs[pos].dtype)
        pos += 1
        @pl.when(i == n_tiles - 1)
        def _b(): outs[pos][0] = y[th-1:th].astype(outs[pos].dtype)
        pos += 1
    if mode in ("full", "edges", "lr"):
        outs[pos][0] = y[:, 0, :].astype(outs[pos].dtype); pos += 1
        outs[pos][0] = y[:, wp-1, :].astype(outs[pos].dtype); pos += 1
    if mode == "plain":
        outs[0][0] = y.astype(outs[0].dtype)

halo_top = pl.BlockSpec((1,1,wp,sc), lambda b_, i_: (b_, jax.lax.max(i_*th-1, 0), 0, 0), memory_space=pltpu.VMEM)
cur = pl.BlockSpec((1,th,wp,sc), lambda b_, i_: (b_, i_, 0, 0), memory_space=pltpu.VMEM)
halo_bot = pl.BlockSpec((1,1,wp,sc), lambda b_, i_: (b_, jax.lax.min((i_+1)*th, n_tiles*th-1), 0, 0), memory_space=pltpu.VMEM)
in_specs = [halo_top, cur, halo_bot,
            pl.BlockSpec((9, sc, qco), lambda b_, i_: (0,0,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qco), lambda b_, i_: (0,0), memory_space=pltpu.VMEM)]
out_specs, out_shape = [], []
if mode in ("full", "pool"):
    out_specs.append(pl.BlockSpec((1,th,wp,co), lambda b_, i_: (b_, i_, 0, 0), memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((n,hp,wp,co), jnp.bfloat16))
if mode in ("full", "edges", "tb"):
    for spec, shp in [((1,1,wp,qco), (n,1,wp,qco)), ((1,1,wp,qco), (n,1,wp,qco))]:
        out_specs.append(pl.BlockSpec(spec, lambda b_, i_: (b_, 0, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))
if mode in ("full", "edges", "lr"):
    for spec, shp in [((1,th,qco), (n,hp,qco)), ((1,th,qco), (n,hp,qco))]:
        out_specs.append(pl.BlockSpec(spec, lambda b_, i_: (b_, i_, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))
if mode == "plain":
    out_specs.append(pl.BlockSpec((1,th,wp,qco), lambda b_, i_: (b_, i_, 0, 0), memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((n,hp,wp,qco), jnp.bfloat16))

f = pl.pallas_call(kernel, grid=(n, n_tiles), in_specs=in_specs,
                   out_specs=out_specs, out_shape=out_shape,
                   scratch_shapes=[pltpu.VMEM((th, wp, qco), jnp.float32)])
res = jax.jit(lambda a, b, c: f(a, a, a, b, c))(x, wd, bias)
jax.block_until_ready(res)
print(mode, "OK", [r.shape for r in (res if isinstance(res, (list, tuple)) else [res])])
