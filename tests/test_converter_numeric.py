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
