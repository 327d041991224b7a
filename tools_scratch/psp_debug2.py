"""Staged pSp bench with eval_shape init + 4-way split; prints per stage."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.models.unet import MaskDetector


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


bs, hw = 4, 256
model = PSP(output_size=1024, use_attention=True, dtype=jnp.bfloat16)
det = MaskDetector(dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
rs = np.random.RandomState(0)
src = jnp.asarray(rs.rand(bs, hw, hw, 3) * 2 - 1, jnp.float32)
ref = jnp.asarray(rs.rand(bs, hw, hw, 3) * 2 - 1, jnp.float32)
mask0 = jnp.zeros((bs, hw, hw), jnp.float32)

dev = jax.devices()[0]
stamp("eval_shape init start")
md_shapes = jax.eval_shape(det.init, key, (src + 1) / 2)
vs_shapes = jax.eval_shape(
    lambda k, a, b, m: model.init(
        {"params": k, "noise": k}, a, ref=b, src_mask=m, train=False),
    key, src, ref, mask0)
fill = np.random.RandomState(2)
host = lambda t: jax.device_put(
    jax.tree.map(lambda s: (fill.randn(*s.shape) * 0.05).astype(s.dtype), t), dev)
md_vars = host(md_shapes)
vs = host(vs_shapes)
stamp("params filled")

mdf = jax.jit(lambda s: det.apply(
    md_vars, (s + 1) / 2, method=MaskDetector.predict_mask))
m = mdf(src); jax.block_until_ready(m)
stamp("detector ok")

taps = jax.jit(lambda img: model.apply(
    vs, img, train=False, method=PSP.encode_taps))
t_src = taps(src); jax.block_until_ready(t_src)
stamp("backbone ok")
t_ref = taps(ref); jax.block_until_ready(t_ref)
stamp("backbone(ref) ok (cached)")

fuse = jax.jit(lambda st, rt, mm: model.apply(
    vs, st, rt, mm, train=False, method=PSP.encode_from_taps))
codes = fuse(t_src, t_ref, m); jax.block_until_ready(codes)
stamp(f"fusion+styles ok {codes.shape}")

dec = jax.jit(lambda c: jnp.clip(model.apply(
    vs, c, randomize_noise=False, method=PSP.decode), -1.0, 1.0))
img = dec(codes); jax.block_until_ready(img)
stamp(f"decoder ok {img.shape}")

t0 = time.perf_counter()
x = src
for _ in range(10):
    img = dec(fuse(taps(x), t_ref, mdf(x)))
    x = jnp.clip(jax.image.resize(img, (bs, hw, hw, 3), "linear"), -1, 1)
jax.block_until_ready(img)
dt = (time.perf_counter() - t0) / 10
stamp(f"pipeline {dt*1e3:.1f} ms/batch = {bs/dt:.2f} imgs/s")
