"""Weight-converter tests.

The real pretrained checkpoints can't be downloaded in this image, so:
- full numeric parity is validated for the UNet/MaskDetector by building an
  equivalent torch model *here* (from the architecture spec, not the
  reference source), converting its random weights, and comparing forwards;
- the StyleGAN2 and IR-SE converters are validated structurally: fabricated
  state dicts with the exact torch key names/shapes must produce trees whose
  structure and shapes match model.init exactly.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.models.stylegan2 import Generator
from face_mask_inpaint_tpu.models.unet import MaskDetector
from face_mask_inpaint_tpu.tools import convert_torch as ct

KEY = jax.random.PRNGKey(0)


# ---- torch UNet equivalent (spec: unet_parts.py / unet_model.py) ----------

def _double_conv(cin, cmid, cout):
    return nn.Sequential(
        nn.Conv2d(cin, cmid, 3, padding=1), nn.BatchNorm2d(cmid), nn.ReLU(True),
        nn.Conv2d(cmid, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(True),
    )


class _TorchUp(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Module()
        self.conv.double_conv = _double_conv(cin, cin // 2, cout)

    def forward(self, x1, x2):
        x1 = F.interpolate(x1, scale_factor=2, mode="bilinear", align_corners=True)
        dy = x2.size(2) - x1.size(2)
        dx = x2.size(3) - x1.size(3)
        x1 = F.pad(x1, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
        return self.conv.double_conv(torch.cat([x2, x1], dim=1))


class _TorchUNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.inc = nn.Module()
        self.inc.double_conv = _double_conv(3, 64, 64)
        for i, (cin, cout) in enumerate([(64, 128), (128, 256), (256, 512), (512, 512)]):
            down = nn.Module()
            down.maxpool_conv = nn.Sequential(nn.Identity(), nn.Module())
            down.maxpool_conv[1].double_conv = _double_conv(cin, cout, cout)
            setattr(self, f"down{i + 1}", down)
        for i, (cin, cout) in enumerate([(1024, 256), (512, 128), (256, 64), (128, 64)]):
            setattr(self, f"up{i + 1}", _TorchUp(cin, cout))
        self.outc = nn.Module()
        self.outc.conv = nn.Conv2d(64, 2, 1)

    def forward(self, x):
        x1 = self.inc.double_conv(x)
        x2 = self.down1.maxpool_conv[1].double_conv(F.max_pool2d(x1, 2))
        x3 = self.down2.maxpool_conv[1].double_conv(F.max_pool2d(x2, 2))
        x4 = self.down3.maxpool_conv[1].double_conv(F.max_pool2d(x3, 2))
        x5 = self.down4.maxpool_conv[1].double_conv(F.max_pool2d(x4, 2))
        y = self.up1(x5, x4)
        y = self.up2(y, x3)
        y = self.up3(y, x2)
        y = self.up4(y, x1)
        return self.outc.conv(y)


def test_unet_converter_numeric_parity():
    tm = _TorchUNet().eval()
    # perturb BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.4)
    sd = {f"model.{k}": v for k, v in tm.state_dict().items()}
    sd = {k: v.numpy() for k, v in sd.items() if "num_batches" not in k}
    variables = ct.convert_unet(sd)
    variables = jax.tree.map(jnp.asarray, variables)

    model = MaskDetector(n_channels=3, bilinear=True)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    ours = model.apply(variables, jnp.asarray(x), mode="train", train=False)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


def test_stylegan2_converter_structure():
    size = 64
    g = Generator(size=size, style_dim=512, n_mlp=8)
    z = jnp.zeros((1, 512))
    vs = g.init({"params": KEY, "noise": KEY}, [z])

    # fabricate a torch g_ema state dict with the exact reference key names
    rng = np.random.RandomState(0)
    sd = {"input.input": rng.randn(1, 512, 4, 4).astype(np.float32)}
    for i in range(1, 9):
        sd[f"style.{i}.weight"] = rng.randn(512, 512).astype(np.float32)
        sd[f"style.{i}.bias"] = rng.randn(512).astype(np.float32)

    def styled(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = rng.randn(1, cout, cin, k, k).astype(np.float32)
        sd[f"{prefix}.conv.modulation.weight"] = rng.randn(cin, 512).astype(np.float32)
        sd[f"{prefix}.conv.modulation.bias"] = np.ones(cin, np.float32)
        sd[f"{prefix}.noise.weight"] = np.zeros(1, np.float32)
        sd[f"{prefix}.activate.bias"] = np.zeros(cout, np.float32)

    def torgb(prefix, cin):
        sd[f"{prefix}.conv.weight"] = rng.randn(1, 3, cin, 1, 1).astype(np.float32)
        sd[f"{prefix}.conv.modulation.weight"] = rng.randn(cin, 512).astype(np.float32)
        sd[f"{prefix}.conv.modulation.bias"] = np.ones(cin, np.float32)
        sd[f"{prefix}.bias"] = np.zeros((1, 3, 1, 1), np.float32)

    chans = {4: 512, 8: 512, 16: 512, 32: 512, 64: 512}
    styled("conv1", 512, 512, 3)
    torgb("to_rgb1", 512)
    in_ch = 512
    idx = 0
    import math
    for i in range(3, int(math.log2(size)) + 1):
        out_ch = chans[2**i]
        styled(f"convs.{idx}", in_ch, out_ch, 3); idx += 1
        styled(f"convs.{idx}", out_ch, out_ch, 3); idx += 1
        torgb(f"to_rgbs.{i - 3}", out_ch)
        in_ch = out_ch
    for li in range((int(math.log2(size)) - 2) * 2 + 1):
        res = (li + 5) // 2
        sd[f"noises.noise_{li}"] = rng.randn(1, 1, 2**res, 2**res).astype(np.float32)

    conv = ct.convert_stylegan2_generator(sd, size=size)

    flat_ours = jax.tree_util.tree_leaves_with_path(vs["params"])
    import flax.traverse_util as tu
    conv_flat = tu.flatten_dict(conv["params"])
    ours_flat = tu.flatten_dict(vs["params"])
    assert set(conv_flat.keys()) == set(ours_flat.keys()), (
        set(conv_flat) ^ set(ours_flat))
    for k in ours_flat:
        assert tuple(np.shape(conv_flat[k])) == tuple(ours_flat[k].shape), k
    assert set(tu.flatten_dict(conv["noises"])) == set(tu.flatten_dict(vs["noises"]))

    # converted variables actually run
    out, _ = g.apply({"params": jax.tree.map(jnp.asarray, conv["params"]),
                      "noises": jax.tree.map(jnp.asarray, conv["noises"])},
                     [z], randomize_noise=False)
    assert out.shape == (1, size, size, 3)


def test_irse_converter_structure():
    from face_mask_inpaint_tpu.models.irse import Backbone

    rng = np.random.RandomState(0)
    sd = {}

    def add_conv(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    add_conv("input_layer.0", 3, 64, 3)
    add_bn("input_layer.1", 64)
    # PReLU at Sequential index 2 (model_irse.py:20-21)
    sd["input_layer.2.weight"] = np.full(64, 0.25, np.float32)

    from face_mask_inpaint_tpu.models.irse import get_blocks
    for i, spec in enumerate([s for b in get_blocks(50) for s in b]):
        p = f"body.{i}"
        add_bn(f"{p}.res_layer.0", spec.in_channel)
        add_conv(f"{p}.res_layer.1", spec.in_channel, spec.depth, 3)
        sd[f"{p}.res_layer.2.weight"] = np.full(spec.depth, 0.25, np.float32)
        add_conv(f"{p}.res_layer.3", spec.depth, spec.depth, 3)
        add_bn(f"{p}.res_layer.4", spec.depth)
        add_conv(f"{p}.res_layer.5.fc1", spec.depth, spec.depth // 16, 1)
        add_conv(f"{p}.res_layer.5.fc2", spec.depth // 16, spec.depth, 1)
        if spec.in_channel != spec.depth:
            add_conv(f"{p}.shortcut_layer.0", spec.in_channel, spec.depth, 1)
            add_bn(f"{p}.shortcut_layer.1", spec.depth)

    add_bn("output_layer.0", 512)
    sd["output_layer.3.weight"] = rng.randn(512, 512 * 7 * 7).astype(np.float32)
    sd["output_layer.3.bias"] = np.zeros(512, np.float32)
    add_bn("output_layer.4", 512)

    conv = ct.convert_irse_backbone(sd)
    face = Backbone(input_size=112, num_layers=50, mode="ir_se")
    x = jnp.zeros((1, 112, 112, 3))
    vs = face.init(KEY, x, train=False)

    import flax.traverse_util as tu
    conv_p = tu.flatten_dict(conv["params"])
    ours_p = tu.flatten_dict(vs["params"])
    assert set(conv_p.keys()) == set(ours_p.keys()), set(conv_p) ^ set(ours_p)
    for k in ours_p:
        assert tuple(np.shape(conv_p[k])) == tuple(ours_p[k].shape), k

    emb = face.apply(jax.tree.map(jnp.asarray, conv), x, train=False)
    assert emb.shape == (1, 512)


def test_styled_conv_converter_numeric_parity():
    """Converted torch-layout StyledConv weights must reproduce the torch
    computation through our flax StyledConv (modulation linear transpose,
    [1,out,in,k,k] -> HWIO, activate bias, noise weight)."""
    from face_mask_inpaint_tpu.models.stylegan2 import StyledConv

    rng = np.random.RandomState(0)
    n, cin, cout, k, hw, sdim = 2, 8, 12, 3, 6, 16
    sd = {
        "conv.weight": rng.randn(1, cout, cin, k, k).astype(np.float32),
        "conv.modulation.weight": rng.randn(cin, sdim).astype(np.float32),
        "conv.modulation.bias": rng.randn(cin).astype(np.float32) + 1,
        "noise.weight": np.asarray([0.7], np.float32),
        "activate.bias": rng.randn(cout).astype(np.float32),
    }
    sd = {f"blk.{kk}": v for kk, v in sd.items()}
    params = ct._styled_conv(sd, "blk")

    x = rng.randn(n, hw, hw, cin).astype(np.float32)
    style = rng.randn(n, sdim).astype(np.float32)
    noise = rng.randn(n, hw, hw, 1).astype(np.float32)

    mod = StyledConv(cout, k)
    ours = mod.apply({"params": jax.tree.map(jnp.asarray, params)},
                     jnp.asarray(x), jnp.asarray(style), noise=jnp.asarray(noise))

    # torch-core reference computation (stylegan2/model.py:241-346 semantics)
    w = torch.from_numpy(sd["blk.conv.weight"])
    mw = torch.from_numpy(sd["blk.conv.modulation.weight"])
    mb = torch.from_numpy(sd["blk.conv.modulation.bias"])
    s_t = torch.from_numpy(style) @ mw.T * np.float32(1 / np.sqrt(sdim)) + mb
    scale = np.float32(1 / np.sqrt(cin * k * k))
    weight = scale * w * s_t.view(n, 1, cin, 1, 1)
    demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
    weight = (weight * demod.view(n, cout, 1, 1, 1)).reshape(n * cout, cin, k, k)
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2)).reshape(1, n * cin, hw, hw)
    out = F.conv2d(x_t, weight, padding=k // 2, groups=n).view(n, cout, hw, hw)
    out = out + 0.7 * torch.from_numpy(noise.transpose(0, 3, 1, 2))
    out = F.leaky_relu(out + torch.from_numpy(
        sd["blk.activate.bias"]).view(1, -1, 1, 1), 0.2) * np.float32(np.sqrt(2))
    theirs = out.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3, atol=2e-4)


def test_drn_converter_structure():
    from face_mask_inpaint_tpu.models.drn import drn_c_42

    rng = np.random.RandomState(1)
    sd = {}

    def conv(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)

    def bn_(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    chans = (16, 32, 64, 128, 256, 512, 512, 512)
    layers = (1, 1, 3, 4, 6, 3, 1, 1)
    conv("conv1", 3, 16, 7)
    bn_("bn1", 16)
    in_planes = 16
    for li, (n, c) in enumerate(zip(layers, chans), start=1):
        for bi in range(n):
            p = f"layer{li}.{bi}"
            cin = in_planes if bi == 0 else c
            conv(f"{p}.conv1", cin, c, 3)
            bn_(f"{p}.bn1", c)
            conv(f"{p}.conv2", c, c, 3)
            bn_(f"{p}.bn2", c)
            stride_change = li in (2, 3, 4)
            if bi == 0 and (cin != c or stride_change) and li not in (7, 8):
                conv(f"{p}.downsample.0", cin, c, 1)
                bn_(f"{p}.downsample.1", c)
        in_planes = c
    conv("fc", 512, 128, 1)
    sd["fc.bias"] = np.zeros(128, np.float32)

    variables = ct.convert_drn_c(sd)
    model = drn_c_42(head_features=128)
    x = jnp.zeros((1, 32, 32, 3))
    vs = model.init(KEY, x, train=False)

    import flax.traverse_util as tu
    conv_p = tu.flatten_dict(variables["params"])
    ours_p = tu.flatten_dict(vs["params"])
    assert set(conv_p.keys()) == set(ours_p.keys()), sorted(
        set(conv_p) ^ set(ours_p))[:10]
    for k in ours_p:
        assert tuple(np.shape(conv_p[k])) == tuple(ours_p[k].shape), k
    out = model.apply(jax.tree.map(jnp.asarray, variables), x, train=False)
    assert out.shape == (1, 4, 4, 128)
