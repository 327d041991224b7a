"""Data-parallel correctness: one GAN train step over an 8-device mesh must
produce the same losses and parameter updates as the same step on a single
device with the identical global batch (GSPMD sharding is a layout choice,
not a semantics choice)."""

import numpy as np

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.losses.vgg import VGG16Features
from face_mask_inpaint_tpu.models.picnet import define_d
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from face_mask_inpaint_tpu.train.gan import make_gan_train_step
from face_mask_inpaint_tpu.train.optim import adam
from face_mask_inpaint_tpu.train.state import GANTrainState, ModuleState

KEY = jax.random.PRNGKey(0)

ENC = dict(type="pluralistic", ngf=4, z_nc=8, img_f=16, L=1, layers=3,
           norm="none", activation="LeakyReLU", init_type="normal")
DEC = dict(ngf=8, z_nc=8, img_f=32, L=0, layers=3, norm="instance",
           activation="LeakyReLU", init_type="normal")


def test_dp_step_matches_single_device():
    hw, n = 16, 8
    rng = np.random.RandomState(0)
    batch = {
        "src_img": rng.rand(n, hw, hw, 3).astype(np.float32),
        "gt_img": rng.rand(n, hw, hw, 3).astype(np.float32),
        "ref_img": rng.rand(n, hw, hw, 3).astype(np.float32),
        "mask": (rng.rand(n, hw, hw) > 0.5).astype(np.float32),
    }
    gen = ReferenceFill(encoder_params=ENC, decoder_params=DEC, use_att=True,
                        out_size=(hw, hw))
    disc = define_d(ndf=4, img_f=16, layers=3, init_type="normal")
    g_vars = gen.init({"params": KEY, "sample": KEY},
                      jnp.asarray(batch["src_img"]),
                      jnp.asarray(batch["ref_img"]),
                      jnp.asarray(batch["mask"]))
    d_vars = disc.init(KEY, jnp.asarray(batch["gt_img"]))
    vgg = VGG16Features().init(KEY, jnp.asarray(batch["gt_img"]))["params"]
    g_tx, d_tx = adam(1e-3), adam(1e-3)

    def fresh_state():
        g_state = ModuleState.from_variables(g_vars)
        d_state = ModuleState.from_variables(d_vars)
        return GANTrainState(
            step=jnp.zeros([], jnp.int32), generator=g_state,
            discriminator=d_state, g_opt_state=g_tx.init(g_state.params),
            d_opt_state=d_tx.init(d_state.params), rng=KEY)

    step = jax.jit(make_gan_train_step(gen, disc, g_tx, d_tx, vgg))

    # single device
    s1, m1 = step(fresh_state(), {k: jnp.asarray(v) for k, v in batch.items()})

    # 8-device mesh, same global batch
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    s8, m8 = step(replicate_tree(fresh_state(), mesh), shard_batch(batch, mesh))

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)
    # parameter updates identical up to f32 reduction-order noise. NB: Adam
    # normalizes by sqrt(E[g^2]), so for near-zero gradients the UPDATE
    # direction is pure sign-noise under reassociation (e.g. conv biases
    # feeding instance norm, whose gradient is cancelling big terms) —
    # compare with an absolute tolerance of a quarter of one optimizer step
    # (lr=1e-3).
    flat1 = jax.tree.leaves(s1.generator.params)
    flat8 = jax.tree.leaves(jax.device_get(s8.generator.params))
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=2.5e-4)
