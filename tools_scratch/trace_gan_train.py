"""Trace the full GAN training step (bench config 5) for per-op attribution."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench

bs = int(os.environ.get("BS", "8"))
steps = int(os.environ.get("STEPS", "12"))

# reuse bench_gan_train's setup by inlining its body up to the step fn
from face_mask_inpaint_tpu.losses.vgg import VGG16Features
from face_mask_inpaint_tpu.models.picnet import define_d
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.train.gan import make_gan_train_step
from face_mask_inpaint_tpu.train.optim import adam
from face_mask_inpaint_tpu.train.state import GANTrainState, ModuleState

hw = 256
enc = dict(type="pluralistic", ngf=32, z_nc=128, img_f=128, L=6, layers=5,
           norm="none", activation="LeakyReLU", init_type="orthogonal")
dec = dict(ngf=32, z_nc=128, img_f=256, L=0, layers=5, norm="instance",
           activation="LeakyReLU", init_type="orthogonal")
generator = ReferenceFill(encoder_params=enc, decoder_params=dec, dtype=jnp.bfloat16,
                          use_att=True, out_size=(hw, hw))
discriminator = define_d(ndf=32, img_f=128, layers=5, init_type="orthogonal", dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
rs = np.random.RandomState(0)
batch = {
    "src_img": jnp.asarray(rs.rand(bs, hw, hw, 3), jnp.float32),
    "gt_img": jnp.asarray(rs.rand(bs, hw, hw, 3), jnp.float32),
    "ref_img": jnp.asarray(rs.rand(bs, hw, hw, 3), jnp.float32),
    "mask": jnp.asarray((rs.rand(bs, hw, hw) > 0.5), jnp.float32),
}
g_vars = jax.jit(lambda k, s, r, m: generator.init(
    {"params": k, "sample": k}, s, r, m))(
    key, batch["src_img"], batch["ref_img"], batch["mask"])
d_vars = jax.jit(discriminator.init)(key, batch["gt_img"])
vgg_params = jax.jit(lambda k, x: VGG16Features(dtype=jnp.bfloat16).init(k, x)["params"])(
    key, batch["gt_img"])
g_tx, d_tx = adam(1e-4), adam(1e-4)
g_state = ModuleState.from_variables(g_vars)
d_state = ModuleState.from_variables(d_vars)
state = GANTrainState(
    step=jnp.zeros([], jnp.int32), generator=g_state,
    discriminator=d_state, g_opt_state=g_tx.init(g_state.params),
    d_opt_state=d_tx.init(d_state.params), rng=key)
train_step = jax.jit(make_gan_train_step(
    generator, discriminator, g_tx, d_tx, vgg_params))

state, _ = train_step(state, batch)
jax.block_until_ready(state.step)
for _ in range(2):
    state, _ = train_step(state, batch)
jax.block_until_ready(state.step)
tdir = os.environ.get("TRACE_DIR", "/tmp/gan_trace_r3")
with jax.profiler.trace(tdir, create_perfetto_trace=True):
    for _ in range(4):
        state, _ = train_step(state, batch)
    jax.block_until_ready(state.step)
t0 = time.perf_counter()
for _ in range(steps):
    state, _ = train_step(state, batch)
jax.block_until_ready(state.step)
dt = (time.perf_counter() - t0) / steps
print(f"train step {dt*1e3:.2f} ms, {bs/dt:.1f} imgs/s")
