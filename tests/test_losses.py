

def test_vgg_packed_dx_grads_match(monkeypatch):
    """FMI_PACKED_DX_CI3=1 (conv1_1 input-grad via the half-in packed
    stencil, ops/conv.py:conv2d_packed_dx) must reproduce the dense grads —
    both for 4-divisible inputs (packed path) and the fallback."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from face_mask_inpaint_tpu.losses.vgg import VGG16Features

    rng = np.random.RandomState(5)
    model = VGG16Features()
    for hw in (64, 62):  # 64: packed path; 62 % 4 != 0: dense fallback
        x = jnp.asarray(rng.randn(2, hw, hw, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss(x):
            taps = model.apply(variables, x)
            return sum(jnp.sum(jnp.abs(t)) for t in taps)

        monkeypatch.setenv("FMI_PACKED_DX_CI3", "0")
        g_dense = jax.grad(loss)(x)
        monkeypatch.setenv("FMI_PACKED_DX_CI3", "1")
        g_packed = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_dense),
                                   rtol=1e-4, atol=1e-4)


def test_discriminator_packed_dx_grads_match(monkeypatch):
    """The Conv2d FMI_PACKED_DX_CI3 hook must also reproduce the dense input
    grads through the discriminator's spectral-normed ci=3 stem (the
    adversarial gradient path into the generator)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from face_mask_inpaint_tpu.models.picnet import define_d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    d = define_d(ndf=16, layers=3, model_type="ResDis")
    variables = d.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(x):
        out = d.apply(variables, x, mutable=["spectral"])[0]
        o = out[0] if isinstance(out, (tuple, list)) else out
        return jnp.sum(jnp.abs(o))

    monkeypatch.setenv("FMI_PACKED_DX_CI3", "0")
    g_dense = jax.grad(loss)(x)
    monkeypatch.setenv("FMI_PACKED_DX_CI3", "1")
    g_packed = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-4)
