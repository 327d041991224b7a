"""Numeric forward-parity for the weight converters.

The real pretrained checkpoints cannot be downloaded in this image, but torch
(cpu) is available: each test builds an equivalent torch model HERE from the
architecture spec (torchvision layouts / reference module specs — not the
reference source), converts its RANDOM weights with tools/convert_torch, and
compares full forward passes. This covers the converters end-to-end at the
numeric level, not just structurally (extends the UNet/StyledConv technique
of tests/test_converter.py to VGG16, LPIPS alex/squeeze/vgg, the IR-SE-50
ArcFace Backbone, and the FID InceptionV3 trunk).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.tools import convert_torch as ct

KEY = jax.random.PRNGKey(0)
torch.manual_seed(0)


def _j(tree):
    return jax.tree.map(jnp.asarray, tree)


def _randomize_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.4)
                if m.affine:
                    m.weight.uniform_(0.7, 1.3)
                    m.bias.normal_(0, 0.1)


# ---------------------------------------------------------------------------
# VGG16 features (torchvision layout: conv indices 0,2,5,7,10,12,14,17,19,21)
# ---------------------------------------------------------------------------

def _torch_vgg16_features(n_convs_per_block=(2, 2, 3, 3, 3),
                          chans=(64, 128, 256, 512, 512)):
    layers, cin = [], 3
    for b, (n, c) in enumerate(zip(n_convs_per_block, chans)):
        for _ in range(n):
            layers += [nn.Conv2d(cin, c, 3, padding=1), nn.ReLU()]
            cin = c
        layers += [nn.MaxPool2d(2)]
    return nn.Sequential(*layers)


def test_vgg16_features_numeric_parity():
    from face_mask_inpaint_tpu.losses.vgg import VGG16Features

    tm = _torch_vgg16_features().eval()
    sd = {f"features.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params = _j(ct.convert_vgg16_features(sd))

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    taps = VGG16Features().apply({"params": params}, jnp.asarray(x))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        # taps after relu1_2 / relu2_2 / relu3_3 / relu4_3 (loss.py:20-29)
        outs, h = [], xt
        for i, layer in enumerate(tm):
            h = layer(h)
            if i in (3, 8, 15, 22):
                outs.append(h)
    assert len(taps) == 4
    for ours, theirs in zip(taps, outs):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)


def test_vgg16_split_features_get_features_parity():
    """get_features (external_function.py:215-229): full trunk split at POOL
    boundaries (vgg[0:5],[5:10],[10:17],[17:24],[24:31]) with the img_crop
    224 bilinear align_corners resize (external_function.py:195-197)."""
    from face_mask_inpaint_tpu.losses.vgg import get_features, normalization

    tm = _torch_vgg16_features().eval()
    sd = {f"features.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params = _j(ct.convert_vgg16_split_features(sd))

    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    outs = get_features(params, jnp.asarray(x), layers=6)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = F.interpolate(xt, size=(224, 224), mode="bilinear",
                          align_corners=True)
        t_outs = []
        for i, layer in enumerate(tm):
            h = layer(h)
            if i in (4, 9, 16, 23, 30):  # after each MaxPool2d
                t_outs.append(h)
    assert len(outs) == 5
    for ours, theirs in zip(outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)
    # layers arg truncates like the reference's range(1, layers)
    assert len(get_features(params, jnp.asarray(x), layers=3)) == 2

    # Normalization module (external_function.py:205-213)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    got = normalization(jnp.asarray(x), mean, std)
    want = (x - np.asarray(mean).reshape(1, 1, 1, 3)) / np.asarray(std).reshape(1, 1, 1, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# LPIPS — alex / squeeze / vgg trunks + lin heads
# ---------------------------------------------------------------------------

class _TorchFire(nn.Module):
    def __init__(self, cin, squeeze, expand):
        super().__init__()
        self.squeeze = nn.Conv2d(cin, squeeze, 1)
        self.expand1x1 = nn.Conv2d(squeeze, expand, 1)
        self.expand3x3 = nn.Conv2d(squeeze, expand, 3, padding=1)

    def forward(self, x):
        s = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1x1(s)),
                          F.relu(self.expand3x3(s))], 1)


def _torch_alex_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(), nn.MaxPool2d(3, 2),
    )


def _torch_squeeze_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(), nn.MaxPool2d(3, 2),
        _TorchFire(64, 16, 64), _TorchFire(128, 16, 64), nn.MaxPool2d(3, 2),
        _TorchFire(128, 32, 128), _TorchFire(256, 32, 128), nn.MaxPool2d(3, 2),
        _TorchFire(256, 48, 192), _TorchFire(384, 48, 192),
        _TorchFire(384, 64, 256), _TorchFire(512, 64, 256),
    )


_TAP_LAYERS = {  # nn.Sequential indices after which LPIPS taps activations
    "alex": (1, 4, 7, 9, 11),
    "vgg": (3, 8, 15, 22, 29),
    "squeeze": (1, 4, 7, 9, 10, 11, 12),
}


@pytest.mark.parametrize("net_type", ["alex", "squeeze", "vgg"])
def test_lpips_converter_numeric_parity(net_type):
    from face_mask_inpaint_tpu.losses.lpips import N_CHANNELS, LPIPSNet

    trunk = {"alex": _torch_alex_features,
             "squeeze": _torch_squeeze_features,
             "vgg": _torch_vgg16_features}[net_type]().eval()
    sd = {f"features.{k}": v.numpy() for k, v in trunk.state_dict().items()}
    rng = np.random.RandomState(1)
    lin_sd = {f"{i}.1.weight": rng.rand(1, c, 1, 1).astype(np.float32)
              for i, c in enumerate(N_CHANNELS[net_type])}
    params = _j(ct.convert_lpips(sd, lin_sd, net_type))

    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    ours = LPIPSNet(net_type).apply({"params": params},
                                    jnp.asarray(x), jnp.asarray(y))

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def taps(img):
        h = (torch.from_numpy(img.transpose(0, 3, 1, 2)) - shift) / scale
        outs = []
        for i, layer in enumerate(trunk):
            h = layer(h)
            if i in _TAP_LAYERS[net_type]:
                outs.append(h)
        return outs

    def unit(t):
        return t / (torch.sqrt(torch.sum(t**2, dim=1, keepdim=True)) + 1e-10)

    with torch.no_grad():
        total = 0.0
        for i, (a, b) in enumerate(zip(taps(x), taps(y))):
            d = (unit(a) - unit(b)) ** 2
            w = torch.from_numpy(lin_sd[f"{i}.1.weight"])
            total += F.conv2d(d, w).mean([2, 3]).sum().item() / x.shape[0]
    np.testing.assert_allclose(float(ours), total, rtol=2e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# IR-SE-50 ArcFace Backbone (reference spec: helpers.py / model_irse.py)
# ---------------------------------------------------------------------------

class _TorchSE(nn.Module):
    def __init__(self, c, reduction=16):
        super().__init__()
        self.fc1 = nn.Conv2d(c, c // reduction, 1, bias=False)
        self.fc2 = nn.Conv2d(c // reduction, c, 1, bias=False)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class _TorchBottleneckIRSE(nn.Module):
    def __init__(self, cin, depth, stride):
        super().__init__()
        if cin == depth:
            self.shortcut_layer = nn.MaxPool2d(1, stride)
        else:
            self.shortcut_layer = nn.Sequential(
                nn.Conv2d(cin, depth, 1, stride, bias=False),
                nn.BatchNorm2d(depth))
        self.res_layer = nn.Sequential(
            nn.BatchNorm2d(cin),
            nn.Conv2d(cin, depth, 3, 1, 1, bias=False), nn.PReLU(depth),
            nn.Conv2d(depth, depth, 3, stride, 1, bias=False),
            nn.BatchNorm2d(depth), _TorchSE(depth))

    def forward(self, x):
        return self.res_layer(x) + self.shortcut_layer(x)


class _TorchIRSE50(nn.Module):
    def __init__(self):
        super().__init__()
        from face_mask_inpaint_tpu.models.irse import get_blocks

        self.input_layer = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64),
            nn.PReLU(64))
        self.body = nn.Sequential(*[
            _TorchBottleneckIRSE(s.in_channel, s.depth, s.stride)
            for blk in get_blocks(50) for s in blk])
        self.output_layer = nn.Sequential(
            nn.BatchNorm2d(512), nn.Dropout(0.6), nn.Flatten(),
            nn.Linear(512 * 7 * 7, 512), nn.BatchNorm1d(512, affine=True))

    def forward(self, x):
        h = self.output_layer(self.body(self.input_layer(x)))
        return h / torch.norm(h, dim=1, keepdim=True)


def test_irse_backbone_numeric_parity():
    from face_mask_inpaint_tpu.models.irse import Backbone

    tm = _TorchIRSE50().eval()
    _randomize_bn(tm)
    # torch names res_layer.0..5 / shortcut_layer.0..1 match the checkpoint
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    variables = _j(ct.convert_irse_backbone(sd))

    x = np.random.RandomState(0).rand(2, 112, 112, 3).astype(np.float32)
    ours = Backbone(input_size=112, num_layers=50, mode="ir_se").apply(
        variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# InceptionV3 trunk (torchvision layout) for FID
# ---------------------------------------------------------------------------

class _TB(nn.Module):  # BasicConv2d
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):
    return F.avg_pool2d(x, 3, 1, padding=1, count_include_pad=True)


class _TIA(nn.Module):  # InceptionA
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = _TB(cin, 64, kernel_size=1)
        self.branch5x5_1 = _TB(cin, 48, kernel_size=1)
        self.branch5x5_2 = _TB(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _TB(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TB(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TB(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _TB(cin, pool, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avgp(x))], 1)


class _TIB(nn.Module):  # InceptionB
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _TB(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _TB(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TB(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TB(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class _TIC(nn.Module):  # InceptionC
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _TB(cin, 192, kernel_size=1)
        self.branch7x7_1 = _TB(cin, c7, kernel_size=1)
        self.branch7x7_2 = _TB(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _TB(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _TB(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _TB(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _TB(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _TB(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _TB(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _TB(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avgp(x))], 1)


class _TID(nn.Module):  # InceptionD
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _TB(cin, 192, kernel_size=1)
        self.branch3x3_2 = _TB(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _TB(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _TB(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _TB(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _TB(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class _TIE(nn.Module):  # InceptionE
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = _TB(cin, 320, kernel_size=1)
        self.branch3x3_1 = _TB(cin, 384, kernel_size=1)
        self.branch3x3_2a = _TB(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _TB(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _TB(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _TB(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _TB(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _TB(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _TB(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(_avgp(x))], 1)


class _TorchInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _TB(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _TB(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _TB(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _TB(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _TB(80, 192, kernel_size=3)
        self.Mixed_5b = _TIA(192, 32)
        self.Mixed_5c = _TIA(256, 64)
        self.Mixed_5d = _TIA(288, 64)
        self.Mixed_6a = _TIB(288)
        self.Mixed_6b = _TIC(768, 128)
        self.Mixed_6c = _TIC(768, 160)
        self.Mixed_6d = _TIC(768, 160)
        self.Mixed_6e = _TIC(768, 192)
        self.Mixed_7a = _TID(768)
        self.Mixed_7b = _TIE(1280)
        self.Mixed_7c = _TIE(2048)

    def forward(self, x):
        x = x * 2 - 1
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(
            self.Mixed_6a(x)))))
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def test_inception_v3_converter_numeric_parity():
    from face_mask_inpaint_tpu.evaluations.fid import InceptionV3Features

    tm = _TorchInception().eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    variables = _j(ct.convert_inception_v3(sd))

    x = np.random.RandomState(0).rand(1, 299, 299, 3).astype(np.float32)
    ours = jax.jit(lambda v, x: InceptionV3Features().apply(v, x, train=False))(
        variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# StyleGAN2 full generator (g_ema layout incl. noise buffers)
# ---------------------------------------------------------------------------

def _upfirdn_t(x, k2d, up, down, pad):
    """torch upfirdn2d semantics (op/upfirdn2d.py:142-147): zero-stuff by
    ``up``, pad, FIR filter (symmetric kernels — orientation moot), then
    subsample by ``down``. x: [N, C, H, W]."""
    n, c, h, w = x.shape
    if up > 1:
        z = torch.zeros(n, c, h * up, w * up)
        z[:, :, ::up, ::up] = x
        x = z
    x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
    kk = torch.from_numpy(k2d.astype(np.float32))[None, None]
    x = F.conv2d(x, kk.expand(c, 1, *k2d.shape), groups=c)
    return x[:, :, ::down, ::down]


def _make_kernel_np(k=(1, 3, 3, 1)):
    k2 = np.outer(k, k).astype(np.float32)
    return k2 / k2.sum()


def _equal_linear_t(x, w, b, lr_mul=1.0, act=None):
    scale = (1.0 / np.sqrt(w.shape[1])) * lr_mul
    y = x @ (w * scale).T
    if act == "fused_lrelu":
        return F.leaky_relu(y + b * lr_mul, 0.2) * np.float32(np.sqrt(2))
    return y + b * lr_mul if b is not None else y


def _modulated_t(x, sd, prefix, demodulate, upsample=False):
    """The reference grouped-conv ModulatedConv2d (stylegan2/model.py:187-279)
    on [N, C, H, W] torch tensors; ``style`` is the already-mapped latent."""
    def T(k):
        return torch.from_numpy(sd[k])

    x, style = x
    w = T(f"{prefix}.weight")  # [1, out, in, k, k]
    n = x.shape[0]
    _, cout, cin, k, _ = w.shape
    s = _equal_linear_t(style, T(f"{prefix}.modulation.weight"),
                        T(f"{prefix}.modulation.bias"))
    scale = np.float32(1 / np.sqrt(cin * k * k))
    weight = scale * w * s.view(n, 1, cin, 1, 1)
    if demodulate:
        demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
        weight = weight * demod.view(n, cout, 1, 1, 1)
    if upsample:
        weight = weight.view(n, cout, cin, k, k).transpose(1, 2).reshape(
            n * cin, cout, k, k)
        h, wdt = x.shape[2:]
        out = F.conv_transpose2d(
            x.reshape(1, n * cin, h, wdt), weight, stride=2, padding=0,
            groups=n)
        out = out.view(n, cout, *out.shape[2:])
        # Blur: p = (4 - 2) - (k - 1); pad0 = (p+1)//2 + 1; pad1 = p//2 + 1
        p = 2 - (k - 1)
        out = _upfirdn_t(out, _make_kernel_np() * 4, 1, 1,
                         ((p + 1) // 2 + 1, p // 2 + 1))
    else:
        out = F.conv2d(x.reshape(1, n * cin, *x.shape[2:]),
                       weight.view(n * cout, cin, k, k), padding=k // 2,
                       groups=n).view(n, cout, *x.shape[2:])
    return out


def _styled_conv_t(x_style_noise, sd, prefix, upsample=False):
    x, style, noise = x_style_noise
    out = _modulated_t((x, style), sd, f"{prefix}.conv", True, upsample)
    out = out + torch.from_numpy(sd[f"{prefix}.noise.weight"]) * noise
    b = torch.from_numpy(sd[f"{prefix}.activate.bias"]).view(1, -1, 1, 1)
    return F.leaky_relu(out + b, 0.2) * np.float32(np.sqrt(2))


def _to_rgb_t(x_style_skip, sd, prefix):
    x, style, skip = x_style_skip
    out = _modulated_t((x, style), sd, f"{prefix}.conv", False, False)
    out = out + torch.from_numpy(sd[f"{prefix}.bias"]).view(1, 3, 1, 1)
    if skip is not None:
        # Upsample: p = 4 - 2; pads ((p+1)//2 + 1, p//2) = (2, 1), k * 4
        skip = _upfirdn_t(skip, _make_kernel_np() * 4, 2, 1, (2, 1))
        out = out + skip
    return out


def test_stylegan2_full_generator_numeric_parity():
    """convert_stylegan2_generator end-to-end: random g_ema-layout weights
    (incl. noise buffers) through our flax Generator vs a functional torch
    reference of the synthesis network (stylegan2/model.py:372-550)."""
    from face_mask_inpaint_tpu.models.stylegan2 import Generator

    size, n_mlp, sdim = 32, 2, 512
    rng = np.random.RandomState(0)
    log_size = int(np.log2(size))
    n_pairs = log_size - 2
    chans = {4: 512, 8: 512, 16: 512, 32: 512}

    def conv_sd(prefix, cin, cout, k):
        return {
            f"{prefix}.conv.weight":
                rng.randn(1, cout, cin, k, k).astype(np.float32),
            f"{prefix}.conv.modulation.weight":
                rng.randn(cin, sdim).astype(np.float32),
            f"{prefix}.conv.modulation.bias":
                (rng.randn(cin) * 0.1 + 1).astype(np.float32),
            f"{prefix}.noise.weight":
                np.asarray([rng.rand() * 0.5], np.float32),
            f"{prefix}.activate.bias":
                (rng.randn(cout) * 0.1).astype(np.float32),
        }

    def rgb_sd(prefix, cin):
        return {
            f"{prefix}.conv.weight":
                rng.randn(1, 3, cin, 1, 1).astype(np.float32),
            f"{prefix}.conv.modulation.weight":
                rng.randn(cin, sdim).astype(np.float32),
            f"{prefix}.conv.modulation.bias":
                (rng.randn(cin) * 0.1 + 1).astype(np.float32),
            f"{prefix}.bias": rng.randn(1, 3, 1, 1).astype(np.float32) * 0.1,
        }

    sd = {"input.input": rng.randn(1, 512, 4, 4).astype(np.float32)}
    for i in range(1, n_mlp + 1):
        sd[f"style.{i}.weight"] = rng.randn(sdim, sdim).astype(np.float32)
        sd[f"style.{i}.bias"] = (rng.randn(sdim) * 0.1).astype(np.float32)
    sd.update(conv_sd("conv1", 512, 512, 3))
    sd.update(rgb_sd("to_rgb1", 512))
    cin = 512
    for i in range(n_pairs):
        cout = chans[2 ** (i + 3)]
        sd.update(conv_sd(f"convs.{2 * i}", cin, cout, 3))
        sd.update(conv_sd(f"convs.{2 * i + 1}", cout, cout, 3))
        sd.update(rgb_sd(f"to_rgbs.{i}", cout))
        cin = cout
    num_layers = (log_size - 2) * 2 + 1
    for i in range(num_layers):
        res = (i + 5) // 2
        sd[f"noises.noise_{i}"] = rng.randn(
            1, 1, 2 ** res, 2 ** res).astype(np.float32)

    variables = ct.convert_stylegan2_generator(sd, size)
    variables = {k: _j(v) for k, v in variables.items()}

    z = rng.randn(2, sdim).astype(np.float32)
    gen = Generator(size=size, style_dim=sdim, n_mlp=n_mlp)
    ours, _ = gen.apply(variables, [jnp.asarray(z)], randomize_noise=False)

    with torch.no_grad():
        zt = torch.from_numpy(z)
        h = zt * torch.rsqrt(torch.mean(zt ** 2, dim=1, keepdim=True) + 1e-8)
        for i in range(1, n_mlp + 1):
            h = _equal_linear_t(
                h, torch.from_numpy(sd[f"style.{i}.weight"]),
                torch.from_numpy(sd[f"style.{i}.bias"]), lr_mul=0.01,
                act="fused_lrelu")
        latent = h
        noises = [torch.from_numpy(sd[f"noises.noise_{i}"])
                  for i in range(num_layers)]
        out = torch.from_numpy(sd["input.input"]).expand(2, -1, -1, -1)
        out = _styled_conv_t((out, latent, noises[0]), sd, "conv1")
        skip = _to_rgb_t((out, latent, None), sd, "to_rgb1")
        for i in range(n_pairs):
            out = _styled_conv_t((out, latent, noises[1 + 2 * i]), sd,
                                 f"convs.{2 * i}", upsample=True)
            out = _styled_conv_t((out, latent, noises[2 + 2 * i]), sd,
                                 f"convs.{2 * i + 1}")
            skip = _to_rgb_t((out, latent, skip), sd, f"to_rgbs.{i}")
        theirs = skip.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3, atol=5e-3)


# ---------------------------------------------------------------------------
# GradualStyleEncoder (pSp encoder with reference fusion)
# ---------------------------------------------------------------------------

class _TorchGSEBlock(nn.Module):
    """GradualStyleBlock spec (psp_encoders.py:13-37): stride-2 conv chain
    with LeakyReLU to 1x1, then EqualLinear(lr_mul=1)."""

    def __init__(self, cin, cout, spatial):
        super().__init__()
        num_pools = int(np.log2(spatial))
        layers = [nn.Conv2d(cin, cout, 3, 2, 1), nn.LeakyReLU()]
        for _ in range(num_pools - 1):
            layers += [nn.Conv2d(cout, cout, 3, 2, 1), nn.LeakyReLU()]
        self.convs = nn.Sequential(*layers)
        self.linear = nn.Linear(cout, cout)  # stand-in for EqualLinear params
        self.cout = cout

    def forward(self, x):
        h = self.convs(x).view(-1, self.cout)
        scale = np.float32(1 / np.sqrt(self.cout))
        return h @ (self.linear.weight * scale).T + self.linear.bias


def _torch_ega(conv, out_conv, mask, srcf, reff):
    """ExampleGuidedAttention core (example_guided_att.py:5-41)."""
    n, c, h, w = srcf.shape
    q = conv(srcf).reshape(n, c // 4, h * w)
    energy = torch.einsum("nci,ncj->nij", q, q)
    att = torch.softmax(energy, dim=-1)
    src_att = torch.einsum("nij,ncj->nci", att, srcf.reshape(n, c, h * w))
    ref_att = torch.einsum("nij,ncj->nci", att, reff.reshape(n, c, h * w))
    src_att = src_att.reshape(n, c, h, w)
    ref_att = ref_att.reshape(n, c, h, w)
    ex_guide = (1 - mask) * ref_att + mask * reff
    return out_conv(torch.cat([ex_guide, src_att], 1))


class _TorchGSE(nn.Module):
    """GradualStyleEncoder spec (psp_encoders.py:40-152) with attention."""

    def __init__(self, n_styles=18):
        super().__init__()
        from face_mask_inpaint_tpu.models.irse import get_blocks

        self.input_layer = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64),
            nn.PReLU(64))
        self.body = nn.Sequential(*[
            _TorchBottleneckIRSE(s.in_channel, s.depth, s.stride)
            for blk in get_blocks(50) for s in blk])
        self.styles = nn.ModuleList([
            _TorchGSEBlock(512, 512, 16 if j < 3 else 32 if j < 7 else 64)
            for j in range(n_styles)])
        self.latlayer1 = nn.Conv2d(256, 512, 1)
        self.latlayer2 = nn.Conv2d(128, 512, 1)
        self.attention1 = nn.Module()
        self.attention1.conv = nn.Conv2d(512, 128, 1, bias=False)
        self.attention1.out_conv = nn.Conv2d(1024, 512, 1)
        self.attention2 = nn.Module()
        self.attention2.conv = nn.Conv2d(256, 64, 1, bias=False)
        self.attention2.out_conv = nn.Conv2d(512, 256, 1)
        self.n_styles = n_styles

    def taps(self, x):
        h = self.input_layer(x)
        outs = {}
        for i, m in enumerate(self.body):
            h = m(h)
            if i in (6, 20, 23):
                outs[i] = h
        return outs[6], outs[20], outs[23]

    def forward(self, x, ref, mask):
        c1, c2, c3 = self.taps(x)
        r1, r2, r3 = self.taps(ref)

        def mk(sz):
            return F.interpolate(mask, size=sz, mode="bilinear",
                                 align_corners=True)

        m3, m2, m1 = mk(c3.shape[2:]), mk(c2.shape[2:]), mk(c1.shape[2:])
        c3 = _torch_ega(self.attention1.conv, self.attention1.out_conv,
                        m3, c3, r3)
        c2 = _torch_ega(self.attention2.conv, self.attention2.out_conv,
                        m2, c2, r2)
        c1 = m1 * r1 + (1 - m1) * c1

        def up_add(a, b):
            return F.interpolate(a, size=b.shape[2:], mode="bilinear",
                                 align_corners=True) + b

        p2 = up_add(c3, self.latlayer1(c2))
        p1 = up_add(p2, self.latlayer2(c1))
        outs = [self.styles[j](c3) for j in range(3)]
        outs += [self.styles[j](p2) for j in range(3, 7)]
        outs += [self.styles[j](p1) for j in range(7, self.n_styles)]
        return torch.stack(outs, dim=1)


def test_gradual_style_encoder_numeric_parity():
    from face_mask_inpaint_tpu.models.irse import GradualStyleEncoder

    torch.manual_seed(1)
    tm = _TorchGSE().eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    variables = _j(ct.convert_gradual_style_encoder(sd))

    rng = np.random.RandomState(3)
    x = (rng.rand(1, 256, 256, 3) * 2 - 1).astype(np.float32)
    ref = (rng.rand(1, 256, 256, 3) * 2 - 1).astype(np.float32)
    mask = (rng.rand(1, 256, 256) > 0.5).astype(np.float32)

    enc = GradualStyleEncoder(use_attention=True)
    ours = enc.apply(variables, jnp.asarray(x), ref=jnp.asarray(ref),
                     mask=jnp.asarray(mask), train=False)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    torch.from_numpy(ref.transpose(0, 3, 1, 2)),
                    torch.from_numpy(mask[:, None]))
    assert ours.shape == tuple(theirs.shape) == (1, 18, 512)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Combined pSp checkpoint (encoder + decoder + latent_avg)
# ---------------------------------------------------------------------------

def test_convert_psp_combined_numeric_parity():
    """convert_psp routes 'encoder.'/'decoder.' keys through the two pinned
    sub-converters and carries latent_avg; verify the FULL composite forward
    (psp.py:86-119: codes + latent_avg -> decoder(input_is_latent) ) against
    the composed torch references."""
    from face_mask_inpaint_tpu.models.psp import PSP

    size, n_mlp, sdim = 32, 8, 512  # PSP fixes Generator(n_mlp=8)
    n_styles = int(np.log2(size)) * 2 - 2  # 8
    torch.manual_seed(2)
    enc_t = _TorchGSE(n_styles=n_styles).eval()
    _randomize_bn(enc_t)
    enc_sd = {k: v.numpy() for k, v in enc_t.state_dict().items()
              if "num_batches" not in k}

    rng = np.random.RandomState(7)
    log_size = int(np.log2(size))
    n_pairs = log_size - 2

    def conv_sd(prefix, cin, cout, k):
        return {
            f"{prefix}.conv.weight":
                rng.randn(1, cout, cin, k, k).astype(np.float32),
            f"{prefix}.conv.modulation.weight":
                rng.randn(cin, sdim).astype(np.float32),
            f"{prefix}.conv.modulation.bias":
                (rng.randn(cin) * 0.1 + 1).astype(np.float32),
            f"{prefix}.noise.weight":
                np.asarray([rng.rand() * 0.5], np.float32),
            f"{prefix}.activate.bias":
                (rng.randn(cout) * 0.1).astype(np.float32),
        }

    def rgb_sd(prefix, cin):
        return {
            f"{prefix}.conv.weight":
                rng.randn(1, 3, cin, 1, 1).astype(np.float32),
            f"{prefix}.conv.modulation.weight":
                rng.randn(cin, sdim).astype(np.float32),
            f"{prefix}.conv.modulation.bias":
                (rng.randn(cin) * 0.1 + 1).astype(np.float32),
            f"{prefix}.bias": rng.randn(1, 3, 1, 1).astype(np.float32) * 0.1,
        }

    dec_sd = {"input.input": rng.randn(1, 512, 4, 4).astype(np.float32)}
    for i in range(1, n_mlp + 1):
        dec_sd[f"style.{i}.weight"] = rng.randn(sdim, sdim).astype(np.float32)
        dec_sd[f"style.{i}.bias"] = (rng.randn(sdim) * 0.1).astype(np.float32)
    dec_sd.update(conv_sd("conv1", 512, 512, 3))
    dec_sd.update(rgb_sd("to_rgb1", 512))
    for i in range(n_pairs):
        dec_sd.update(conv_sd(f"convs.{2 * i}", 512, 512, 3))
        dec_sd.update(conv_sd(f"convs.{2 * i + 1}", 512, 512, 3))
        dec_sd.update(rgb_sd(f"to_rgbs.{i}", 512))
    num_layers = (log_size - 2) * 2 + 1
    for i in range(num_layers):
        res = (i + 5) // 2
        dec_sd[f"noises.noise_{i}"] = rng.randn(
            1, 1, 2 ** res, 2 ** res).astype(np.float32)

    latent_avg = rng.randn(n_styles, sdim).astype(np.float32) * 0.1
    sd = {f"encoder.{k}": v for k, v in enc_sd.items()}
    sd.update({f"decoder.{k}": v for k, v in dec_sd.items()})
    sd["latent_avg"] = latent_avg

    variables = ct.convert_psp(sd, output_size=size)
    variables = {k: _j(v) for k, v in variables.items()}
    # routing: the sub-trees must be exactly the sub-converter outputs
    import flax.traverse_util as tu

    sub = tu.flatten_dict(
        _j(ct.convert_stylegan2_generator(dec_sd, size)["params"]))
    got = tu.flatten_dict(variables["params"]["decoder"])
    assert set(sub) == set(got)
    for k in sub:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(sub[k]))

    x = (rng.rand(1, 256, 256, 3) * 2 - 1).astype(np.float32)
    ref = (rng.rand(1, 256, 256, 3) * 2 - 1).astype(np.float32)
    mask = (rng.rand(1, 256, 256) > 0.5).astype(np.float32)

    model = PSP(output_size=size, start_from_latent_avg=True,
                use_attention=True)
    ours, latents = model.apply(
        variables, jnp.asarray(x), ref=jnp.asarray(ref),
        src_mask=jnp.asarray(mask), resize=False, randomize_noise=False,
        return_latents=True, train=False)

    with torch.no_grad():
        codes = enc_t(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(ref.transpose(0, 3, 1, 2)),
                      torch.from_numpy(mask[:, None]))
        codes = codes + torch.from_numpy(latent_avg)[None]
        noises = [torch.from_numpy(dec_sd[f"noises.noise_{i}"])
                  for i in range(num_layers)]
        out = torch.from_numpy(dec_sd["input.input"]).expand(1, -1, -1, -1)
        out = _styled_conv_t((out, codes[:, 0], noises[0]), dec_sd, "conv1")
        skip = _to_rgb_t((out, codes[:, 1], None), dec_sd, "to_rgb1")
        li = 1
        for i in range(n_pairs):
            out = _styled_conv_t((out, codes[:, li], noises[1 + 2 * i]),
                                 dec_sd, f"convs.{2 * i}", upsample=True)
            out = _styled_conv_t((out, codes[:, li + 1], noises[2 + 2 * i]),
                                 dec_sd, f"convs.{2 * i + 1}")
            skip = _to_rgb_t((out, codes[:, li + 2], skip), dec_sd,
                             f"to_rgbs.{i}")
            li += 2
        theirs = skip.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(latents),
                               codes.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               rtol=2e-3, atol=6e-3)


# ---------------------------------------------------------------------------
# DRN-C-42 (alternative ReferenceFill encoder; reference drn.py:109-414)
# ---------------------------------------------------------------------------

class _TorchDRNBasic(nn.Module):
    def __init__(self, cin, planes, stride=1, dilation=(1, 1),
                 residual=True, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, padding=dilation[0],
                               dilation=dilation[0], bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, padding=dilation[1],
                               dilation=dilation[1], bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.residual = residual
        self.downsample = (nn.Sequential(
            nn.Conv2d(cin, planes, 1, stride, bias=False),
            nn.BatchNorm2d(planes)) if downsample else None)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = self.downsample(x) if self.downsample is not None else x
        if self.residual:
            out = out + res
        return F.relu(out)


class _TorchDRNC42(nn.Module):
    def __init__(self, head_features=128):
        super().__init__()
        ch = (16, 32, 64, 128, 256, 512, 512, 512)
        ly = (1, 1, 3, 4, 6, 3, 1, 1)
        self.conv1 = nn.Conv2d(3, ch[0], 7, 1, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(ch[0])

        def group(cin, planes, blocks, stride=1, dilation=1,
                  new_level=True, residual=True):
            down = stride != 1 or cin != planes
            first_dil = ((1, 1) if dilation == 1 else
                         (dilation // 2 if new_level else dilation,
                          dilation))
            mods = [_TorchDRNBasic(cin, planes, stride, first_dil,
                                   residual, down)]
            for _ in range(1, blocks):
                mods.append(_TorchDRNBasic(planes, planes, 1,
                                           (dilation, dilation), residual))
            return nn.Sequential(*mods)

        self.layer1 = group(ch[0], ch[0], ly[0])
        self.layer2 = group(ch[0], ch[1], ly[1], stride=2)
        self.layer3 = group(ch[1], ch[2], ly[2], stride=2)
        self.layer4 = group(ch[2], ch[3], ly[3], stride=2)
        self.layer5 = group(ch[3], ch[4], ly[4], dilation=2, new_level=False)
        self.layer6 = group(ch[4], ch[5], ly[5], dilation=4, new_level=False)
        self.layer7 = group(ch[5], ch[6], ly[6], dilation=2, new_level=False,
                            residual=False)
        self.layer8 = group(ch[6], ch[7], ly[7], dilation=1, new_level=False,
                            residual=False)
        self.fc = nn.Conv2d(ch[7], head_features, 1)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        for i in range(1, 9):
            x = getattr(self, f"layer{i}")(x)
        return self.fc(x)


def test_drn_c42_converter_numeric_parity():
    from face_mask_inpaint_tpu.models.drn import drn_c_42

    torch.manual_seed(3)
    tm = _TorchDRNC42().eval()
    _randomize_bn(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    variables = _j(ct.convert_drn_c(sd))

    x = np.random.RandomState(5).rand(1, 64, 64, 3).astype(np.float32)
    ours = drn_c_42().apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-3)
