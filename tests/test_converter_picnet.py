"""Numeric forward-parity for convert_picnet_module (the spectral-norm
walker): torch PICNet modules built HERE from the reference spec
(network.py:76-370 / base_function.py:207-448 / external_function.py:16-72
module layouts — not the reference source), with the reference's CUSTOM
SpectralNorm key layout (<conv>.module.weight_bar/_u/_v). Each model runs
several forwards first so u/v converge, as in a trained checkpoint; the
converter's convT u-recovery (power iteration, sn_conv) then reproduces the
same sigma."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.tools import convert_torch as ct


def _j(tree):
    return jax.tree.map(jnp.asarray, tree)


def _l2n_t(v):
    return v / (v.norm() + 1e-12)


class _SN(nn.Module):
    """Reference custom SpectralNorm (external_function.py:16-72): one power
    iteration per forward from persisted u/v parameters."""

    def __init__(self, module):
        super().__init__()
        self.module = module
        w = module.weight.data
        height = w.shape[0]
        width = w.view(height, -1).shape[1]
        module.register_parameter("weight_bar", nn.Parameter(w.clone()))
        module.register_parameter(
            "weight_u", nn.Parameter(_l2n_t(torch.randn(height)),
                                     requires_grad=False))
        module.register_parameter(
            "weight_v", nn.Parameter(_l2n_t(torch.randn(width)),
                                     requires_grad=False))
        del module._parameters["weight"]

    def forward(self, *args):
        m = self.module
        w = m.weight_bar.data
        wm = w.view(w.shape[0], -1)
        m.weight_v.data = _l2n_t(wm.t() @ m.weight_u.data)
        m.weight_u.data = _l2n_t(wm @ m.weight_v.data)
        sigma = m.weight_u.data.dot(wm @ m.weight_v.data)
        m.weight = m.weight_bar / sigma
        return m(*args)


def _act(x):
    return F.leaky_relu(x, 0.1)


def _conv(cin, cout, ks, pad):
    return _SN(nn.Conv2d(cin, cout, ks, 1, pad))


class _TResBlock(nn.Module):
    """Pre-activation residual block (base_function.py:207-268)."""

    def __init__(self, cin, cout, hidden, norm="none", down=False):
        super().__init__()
        self.conv1 = _conv(cin, hidden, 3, 1)
        self.conv2 = _conv(hidden, cout, 3, 1)
        self.bypass = _conv(cin, cout, 1, 0)
        self.down = down
        if norm == "instance":
            self.norm1 = nn.InstanceNorm2d(cin, affine=True)
            self.norm2 = nn.InstanceNorm2d(hidden, affine=True)
        else:
            self.norm1 = self.norm2 = None

    def forward(self, x):
        h = x if self.norm1 is None else self.norm1(x)
        h = self.conv1(_act(h))
        h = h if self.norm2 is None else self.norm2(h)
        h = self.conv2(_act(h))
        s = self.bypass(x)
        if self.down:
            h = F.avg_pool2d(h, 2)
            s = F.avg_pool2d(s, 2)
        return h + s


class _TResBlockEncOpt(nn.Module):
    """Stem block (base_function.py:271-305)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = _conv(cin, cout, 3, 1)
        self.conv2 = _conv(cout, cout, 3, 1)
        self.bypass = _conv(cin, cout, 1, 0)

    def forward(self, x):
        h = F.avg_pool2d(self.conv2(_act(self.conv1(x))), 2)
        return h + self.bypass(F.avg_pool2d(x, 2))


class _TResBlockDecoder(nn.Module):
    """Upsampling block (base_function.py:308-364); conv2/bypass are the
    spectral transposed convs whose u lives on the IN axis."""

    def __init__(self, cin, cout, hidden, norm="instance"):
        super().__init__()
        self.conv1 = _conv(cin, hidden, 3, 1)
        self.conv2 = _SN(nn.ConvTranspose2d(hidden, cout, 3, 2, 1, 1))
        self.bypass = _SN(nn.ConvTranspose2d(cin, cout, 3, 2, 1, 1))
        if norm == "instance":
            self.norm1 = nn.InstanceNorm2d(cin, affine=True)
            self.norm2 = nn.InstanceNorm2d(hidden, affine=True)
        else:
            self.norm1 = self.norm2 = None

    def forward(self, x):
        h = x if self.norm1 is None else self.norm1(x)
        h = self.conv1(_act(h))
        h = h if self.norm2 is None else self.norm2(h)
        h = self.conv2(_act(h))
        return h + self.bypass(x)


class _TOutput(nn.Module):
    """Output head (base_function.py:367-398)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = _conv(cin, cout, 3, 0)

    def forward(self, x):
        h = F.pad(_act(x), (1, 1, 1, 1), mode="reflect")
        return torch.tanh(self.conv1(h))


class _TAutoAttn(nn.Module):
    """Short-term self-attention (base_function.py:401-448, pre=None path)."""

    def __init__(self, c):
        super().__init__()
        self.query_conv = nn.Conv2d(c, c // 4, 1)
        self.gamma = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        n, c, h, w = x.shape
        q = self.query_conv(x).reshape(n, c // 4, h * w)
        att = torch.softmax(torch.einsum("nci,ncj->nij", q, q), dim=-1)
        att_x = torch.einsum("nij,ncj->nci", att,
                             x.reshape(n, c, h * w)).reshape(n, c, h, w)
        return self.gamma * att_x + x


class _TResEncoder(nn.Module):
    """ResEncoder 'src' path (network.py:76-178)."""

    def __init__(self, ngf=8, z_nc=8, img_f=16, L=1, layers=3):
        super().__init__()
        self.block0 = _TResBlockEncOpt(3, ngf)
        mult = 1
        for i in range(layers - 1):
            mult_prev, mult = mult, min(2 ** (i + 1), img_f // ngf)
            setattr(self, f"encoder{i}", _TResBlock(
                ngf * mult_prev, ngf * mult, ngf * mult_prev,
                down=(i % 2 == 1)))
        for i in range(L):
            setattr(self, f"infer_prior{i}", _TResBlock(
                ngf * mult, ngf * mult, ngf * mult))
        self.prior = _TResBlock(ngf * mult, 2 * z_nc, ngf * mult)
        self.L, self.layers = L, layers

    def forward(self, x):
        out = self.block0(x)
        for i in range(self.layers - 1):
            out = getattr(self, f"encoder{i}")(out)
        h = out
        for i in range(self.L):
            h = getattr(self, f"infer_prior{i}")(h)
        o = self.prior(h)
        mu, std = torch.chunk(o, 2, dim=1)
        return (mu, F.softplus(std)), out


class _TResGenerator(nn.Module):
    """ResGenerator (network.py:181-273) at layers=3 with attention."""

    def __init__(self, output_nc=3, ngf=8, z_nc=8, img_f=16, L=1, layers=3):
        super().__init__()
        mult = min(2 ** (layers - 1), img_f // ngf)
        ch = ngf * mult
        self.generator = _TResBlock(2 * z_nc, ch, ch)
        for i in range(L):
            setattr(self, f"generator{i}", _TResBlock(ch, ch, ch))
        chs = []
        for i in range(layers):
            m = min(2 ** (layers - i - 1), img_f // ngf)
            chs.append(ngf * m)
        cin = ch
        for i in range(layers):
            setattr(self, f"decoder{i}",
                    _TResBlockDecoder(cin, chs[i], chs[i]))
            cin = chs[i]
        self.attn1 = _TAutoAttn(chs[1])
        setattr(self, f"out{layers - 1}", _TOutput(chs[-1], output_nc))
        self.L, self.layers = L, layers

    def forward(self, encoded, z):
        f = self.generator(z)
        for i in range(self.L):
            f = getattr(self, f"generator{i}")(f)
        out = encoded + f
        for i in range(self.layers):
            out = getattr(self, f"decoder{i}")(out)
            if i == 1:
                out = self.attn1(out)
        return getattr(self, f"out{self.layers - 1}")(out)


class _TResDiscriminator(nn.Module):
    """ResDiscriminator (network.py:310-370) at layers=4 (attention at
    i==2)."""

    def __init__(self, ndf=8, img_f=16, layers=4):
        super().__init__()
        self.block0 = _TResBlockEncOpt(3, ndf)
        mult = 1
        for i in range(layers - 1):
            mult_prev, mult = mult, min(2 ** (i + 1), img_f // ndf)
            if i == 2:
                self.attn2 = _TAutoAttn(ndf * mult_prev)
            setattr(self, f"encoder{i}", _TResBlock(
                ndf * mult_prev, ndf * mult, ndf * mult_prev, down=True))
        self.block1 = _TResBlock(ndf * mult, ndf * mult, ndf * mult)
        self.conv = _conv(ndf * mult, 1, 3, 0)
        self.layers = layers

    def forward(self, x):
        out = self.block0(x)
        for i in range(self.layers - 1):
            if i == 2:
                out = self.attn2(out)
            out = getattr(self, f"encoder{i}")(out)
        out = self.block1(out)
        return self.conv(_act(out))


def _sd(tm):
    return {k: v.numpy() for k, v in tm.state_dict().items()}


def _converge(tm, run, n=40):
    with torch.no_grad():
        for _ in range(n):
            run(tm)


def test_picnet_encoder_converter_numeric_parity():
    from face_mask_inpaint_tpu.models.picnet import define_e

    torch.manual_seed(0)
    tm = _TResEncoder()
    x = torch.randn(2, 3, 32, 32)
    _converge(tm, lambda m: m(x))
    variables = _j(ct.convert_picnet_module(_sd(tm)))

    enc = define_e(ngf=8, z_nc=8, img_f=16, L=1, layers=3, norm="none",
                   activation="LeakyReLU", init_type="normal",
                   encoder_type="src")
    (mu, std), feat = enc.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    with torch.no_grad():
        (mu_t, std_t), feat_t = tm(x)
    np.testing.assert_allclose(np.asarray(mu),
                               mu_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(std),
                               std_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feat),
                               feat_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)


def test_picnet_generator_converter_numeric_parity():
    from face_mask_inpaint_tpu.models.picnet import define_g

    torch.manual_seed(1)
    tm = _TResGenerator()
    enc_feat = torch.randn(2, 16, 4, 4)
    z = torch.randn(2, 16, 4, 4)
    _converge(tm, lambda m: m(enc_feat, z))
    variables = _j(ct.convert_picnet_module(_sd(tm)))

    g = define_g(ngf=8, z_nc=8, img_f=16, L=1, layers=3, norm="instance",
                 activation="LeakyReLU", init_type="normal")
    ours = g.apply(variables, jnp.asarray(enc_feat.numpy().transpose(0, 2, 3, 1)),
                   z=jnp.asarray(z.numpy().transpose(0, 2, 3, 1)), train=False)
    with torch.no_grad():
        theirs = tm(enc_feat, z)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=1e-3)


def test_picnet_discriminator_converter_numeric_parity():
    from face_mask_inpaint_tpu.models.picnet import define_d

    torch.manual_seed(2)
    tm = _TResDiscriminator()
    x = torch.randn(2, 3, 64, 64)
    _converge(tm, lambda m: m(x))
    variables = _j(ct.convert_picnet_module(_sd(tm)))

    d = define_d(ndf=8, img_f=16, layers=4, init_type="normal")
    ours = d.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   train=False)
    with torch.no_grad():
        theirs = tm(x)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)
