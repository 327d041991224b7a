"""Trace the flagship step (bench.py config 3) for per-op attribution."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _flagship_models
from face_mask_inpaint_tpu.models.unet import MaskDetector

bs = int(os.environ.get("BS", "16"))
hw = 256
model, detector = _flagship_models(jnp.bfloat16)
key = jax.random.PRNGKey(0)
src = jnp.asarray(np.random.RandomState(0).rand(bs, hw, hw, 3), jnp.float32)
ref = jnp.asarray(np.random.RandomState(1).rand(bs, hw, hw, 3), jnp.float32)
md_vars = jax.jit(detector.init)(key, src)
g_vars = jax.jit(lambda k, s, r, m: model.init(
    {"params": k, "sample": k}, s, r, m, train=False))(
    key, src, ref, jnp.zeros((bs, hw, hw), jnp.float32))

@jax.jit
def step(src_img):
    m = detector.apply(md_vars, src_img, method=MaskDetector.predict_mask)
    out = model.apply(g_vars, src_img, ref, m, train=False,
                      rngs={"sample": jax.random.PRNGKey(0)})
    return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)

x = step(src); jax.block_until_ready(x)
for _ in range(3):
    x = step(x)
jax.block_until_ready(x)
tdir = os.environ.get("TRACE_DIR", "/tmp/flag_trace_r3")
with jax.profiler.trace(tdir, create_perfetto_trace=True):
    for _ in range(5):
        x = step(x)
    jax.block_until_ready(x)
t0 = time.perf_counter()
for _ in range(20):
    x = step(x)
jax.block_until_ready(x)
dt = (time.perf_counter() - t0) / 20
print(f"step {dt*1e3:.2f} ms, {bs/dt:.1f} imgs/s")
