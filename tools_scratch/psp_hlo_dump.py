"""Dump compiled HLO for each of the pSp bench's seven programs so trace
fusion names (fusion.14, broadcast_multiply_fusion, copy.72, ...) can be
attributed to source ops. Mirrors bench.bench_psp's program construction.

Usage: python tools_scratch/psp_hlo_dump.py [outdir]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.models.unet import MaskDetector

outdir = sys.argv[1] if len(sys.argv) > 1 else "tools_scratch/psp_hlo"
os.makedirs(outdir, exist_ok=True)

dtype = jnp.bfloat16
batch_size = 16
hw = 256
model = PSP(output_size=1024, use_attention=True, dtype=dtype)
det = MaskDetector(dtype=dtype)
key = jax.random.PRNGKey(0)
rs = np.random.RandomState(0)
src = jnp.asarray(rs.rand(batch_size, hw, hw, 3) * 2 - 1, jnp.float32)
ref = jnp.asarray(rs.rand(batch_size, hw, hw, 3) * 2 - 1, jnp.float32)
mask0 = jnp.zeros((batch_size, hw, hw), jnp.float32)
md_shapes = jax.eval_shape(det.init, key, (src + 1) / 2)
vs_shapes = jax.eval_shape(
    lambda k, a, b, m: model.init(
        {"params": k, "noise": k}, a, ref=b, src_mask=m, train=False),
    key, src, ref, mask0)


def shapes_only(tree):
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), tree)


md_s = shapes_only(md_shapes)
vs_s = shapes_only(vs_shapes)

mdf = jax.jit(lambda v, s: det.apply(
    v, (s + 1) / 2, method=MaskDetector.predict_mask))
taps = jax.jit(lambda v, img: model.apply(
    v, img, train=False, method=PSP.encode_taps))
img_s = jax.ShapeDtypeStruct(src.shape, src.dtype)
mask_s = jax.ShapeDtypeStruct((batch_size, hw, hw), jnp.float32)

taps_out = jax.eval_shape(lambda v, i: taps(v, i), vs_s, img_s)
taps_out_s = shapes_only(taps_out)
pyramid = jax.jit(lambda v, st, rt, m: model.apply(
    v, st, rt, m, train=False, method=PSP.encode_pyramid))
pyr_out = jax.eval_shape(
    lambda v, a, b, m: pyramid(v, a, b, m), vs_s, taps_out_s, taps_out_s,
    jax.eval_shape(lambda v, s: mdf(v, s), md_s, img_s))
pyr_out_s = shapes_only(pyr_out)

levels = [
    jax.jit(lambda v, x, _l=lvl: model.apply(
        v, _l, x, method=PSP.encode_styles_level))
    for lvl in range(3)
]
lvl_in = [pyr_out_s[0], pyr_out_s[1], pyr_out_s[2]]
lvl_out_s = [shapes_only(jax.eval_shape(lambda v, x, _f=levels[i]: _f(v, x),
                                        vs_s, lvl_in[i])) for i in range(3)]

dec = jax.jit(lambda v, c0, c1, c2: jnp.clip(model.apply(
    v, method=lambda m, a, b, cc: m.decode(
        m.finalize_codes(a, b, cc), randomize_noise=False),
    a=c0, b=c1, cc=c2), -1.0, 1.0))

PROGRAMS = [
    ("mdf", mdf, (md_s, img_s)),
    ("taps", taps, (vs_s, img_s)),
    ("pyramid", pyramid, (vs_s, taps_out_s, taps_out_s,
                          jax.eval_shape(lambda v, s: mdf(v, s), md_s, img_s))),
    ("level0", levels[0], (vs_s, lvl_in[0])),
    ("level1", levels[1], (vs_s, lvl_in[1])),
    ("level2", levels[2], (vs_s, lvl_in[2])),
    ("dec", dec, (vs_s, lvl_out_s[0], lvl_out_s[1], lvl_out_s[2])),
]

for name, fn, args in PROGRAMS:
    try:
        compiled = fn.lower(*args).compile()
        txt = compiled.as_text()
        with open(os.path.join(outdir, f"{name}.hlo.txt"), "w") as f:
            f.write(txt)
        print(name, "ok", len(txt), "bytes")
    except Exception as e:
        print(name, "FAILED", type(e).__name__, str(e)[:300])
