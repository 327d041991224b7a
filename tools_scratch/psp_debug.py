"""Stage-by-stage pSp bench diagnostic: which jit stalls the relay?"""
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

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
stamp("cpu init start")
with jax.default_device(cpu):
    src_c = jax.device_put(np.asarray(src), cpu)
    md_vars = jax.jit(det.init)(key, (src_c + 1) / 2)
    vs = jax.jit(lambda k, a, b, m: model.init(
        {"params": k, "noise": k}, a, ref=b, src_mask=m, train=False))(
        key, src_c, jax.device_put(np.asarray(ref), cpu),
        jnp.zeros((bs, hw, hw), jnp.float32))
stamp("cpu init done")
md_vars = jax.device_put(md_vars, dev)
vs = jax.device_put(vs, dev)
stamp("device_put done")

mdf = jax.jit(lambda s: det.apply(
    md_vars, (s + 1) / 2, method=MaskDetector.predict_mask))
m = mdf(src)
jax.block_until_ready(m)
stamp("detector compiled+ran")

enc = jax.jit(lambda a, b, mm: model.apply(
    vs, a, ref=b, src_mask=mm, train=False, method=PSP.encode))
codes = enc(src, ref, m)
jax.block_until_ready(codes)
stamp(f"encoder compiled+ran codes={jax.tree.map(jnp.shape, codes)}")

dec = jax.jit(lambda c: jnp.clip(model.apply(
    vs, c, randomize_noise=False, method=PSP.decode), -1.0, 1.0))
img = dec(codes)
jax.block_until_ready(img)
stamp(f"decoder compiled+ran {img.shape}")

t0 = time.perf_counter()
for _ in range(5):
    img = dec(enc(src, ref, mdf(src))); src = jnp.clip(
        jax.image.resize(img, (bs, hw, hw, 3), "linear"), -1, 1)
jax.block_until_ready(img)
dt = (time.perf_counter() - t0) / 5
stamp(f"pipeline: {dt*1e3:.1f} ms/batch = {bs/dt:.2f} imgs/s")
