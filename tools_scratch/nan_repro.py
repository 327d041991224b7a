import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from face_mask_inpaint_tpu.losses.vgg import VGG16Features
from face_mask_inpaint_tpu.models.picnet import define_d
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.train.gan import make_gan_train_step
from face_mask_inpaint_tpu.train.optim import adam
from face_mask_inpaint_tpu.train.state import GANTrainState, ModuleState

key = jax.random.PRNGKey(0)
rs = np.random.RandomState(0)
hw, n = 64, 4
src = jnp.asarray(rs.rand(n, hw, hw, 3), jnp.float32)
gt = jnp.asarray(rs.rand(n, hw, hw, 3), jnp.float32)
ref = jnp.asarray(rs.rand(n, hw, hw, 3), jnp.float32)
mask = jnp.asarray(rs.rand(n, hw, hw) > 0.5, jnp.float32)
enc = dict(type="pluralistic", ngf=8, z_nc=16, img_f=32, L=1, layers=3,
           norm="none", activation="LeakyReLU", init_type="orthogonal")
dec = dict(ngf=16, z_nc=16, img_f=64, L=0, layers=3, norm="instance",
           activation="LeakyReLU", init_type="orthogonal")
gen = ReferenceFill(encoder_params=enc, decoder_params=dec, use_att=True,
                    out_size=(hw, hw))
disc = define_d(ndf=8, img_f=32, layers=3, init_type="orthogonal")
dvv = jax.jit(disc.init)(key, gt)
vgg = jax.jit(lambda k, x: VGG16Features().init(k, x)["params"])(key, gt)
g_tx, d_tx = adam(2e-4), adam(2e-4)
gs = ModuleState.from_variables(
    jax.jit(lambda k, s, r, m: gen.init({"params": k, "sample": k}, s, r, m))(
        key, src, ref, mask))
ds = ModuleState.from_variables(dvv)
state = GANTrainState(step=jnp.zeros([], jnp.int32), generator=gs,
                      discriminator=ds, g_opt_state=g_tx.init(gs.params),
                      d_opt_state=d_tx.init(ds.params), rng=key)
step = jax.jit(make_gan_train_step(gen, disc, g_tx, d_tx, vgg))
b = {"src_img": src, "gt_img": gt, "ref_img": ref, "mask": mask}
st = state
for i in range(4):
    st, m = step(st, b)
    print(i, {k: round(float(v), 4) for k, v in m.items()}, flush=True)
    # find first nan leaf in params
    import flax.traverse_util as tu
    bad = [("/".join(k), ) for k, v in tu.flatten_dict(
        jax.device_get(st.generator.params)).items()
        if not np.all(np.isfinite(v))]
    if bad:
        print("nan G params:", bad[:10]); break
    bad = [("/".join(k),) for k, v in tu.flatten_dict(
        jax.device_get(st.generator.spectral)).items()
        if not np.all(np.isfinite(v))]
    if bad:
        print("nan G spectral:", bad[:10]); break
