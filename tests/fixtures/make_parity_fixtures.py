"""Generate the offline per-module torch parity fixtures (VERDICT r4 item 5).

The north-star parity check needs the real pretrained .pth assets, which this
container cannot fetch. These fixtures freeze the next-best evidence: for the
converter's riskiest per-module mappings, a RECORDED torch forward (weights +
input + output, computed once by torch-cpu here) is committed as .npz, and
tools/parity_report.py's per-module diff re-checks the JAX module against it
on every CI run — no torch, no network, no assets needed at check time.

Modules covered (the mappings most likely to silently drift):
  styled_conv_up   ModulatedConv2d(upsample) + Blur + noise + fused leaky
                   chain (reference stylegan2/model.py:187-346; conversion
                   tools/convert_torch._styled_conv)
  irse_bottleneck  one bottleneck_IR_SE unit with stride-2 + 1x1-conv
                   shortcut + randomized BN stats (helpers.py:76-119;
                   conversion tools/convert_torch._irse_unit)
  vgg_block1       torchvision vgg16 features[0..3] (conv1_1/relu/conv1_2/
                   relu) — the OIHW->HWIO conv mapping + index table entry
                   (loss.py:20-29; conversion tools/convert_torch.conv_w)
  lpips_lin        the LPIPS lin-head stage: unit-normalize, squared diff,
                   frozen 1x1 conv, spatial mean, layer sum
                   (lpips/networks.py:66-95; conversion conv_w on lin heads)

Run:  python tests/fixtures/make_parity_fixtures.py
Writes tests/fixtures/parity/*.npz (deterministic seeds; re-running after a
torch version change may produce bit-different RANDOM weights — the committed
.npz, not this script, is the stable artifact).

npz key convention (consumed by parity_report.module_fixture_parity):
  sd:<torch state-dict key>   weight array in the torch checkpoint layout
  in:<name>                   input arrays (images NCHW, styles [N, D])
  out:<name>                  torch-recorded outputs (images NCHW)
"""

import os

import numpy as np
import torch
import torch.nn.functional as F

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity")


def _save(name, arrays):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    kb = os.path.getsize(path) / 1024
    print(f"{path}: {len(arrays)} arrays, {kb:.0f} KiB")


def _equal_linear(x, w, b):
    # EqualLinear at lr_mul=1 (stylegan2/model.py:141-166)
    return x @ (w * np.float32(1 / np.sqrt(w.shape[1]))).T + b


def make_styled_conv_up():
    """StyledConv with upsample=True: modulated convT + Blur + noise + fused
    leaky — the full 'ModulatedConv2d+Blur chain' (stylegan2/model.py:187-346).
    """
    rng = np.random.RandomState(7)
    n, cin, cout, k, hw, sdim = 2, 12, 8, 3, 6, 16
    sd = {
        "blk.conv.weight": rng.randn(1, cout, cin, k, k).astype(np.float32),
        "blk.conv.modulation.weight": rng.randn(cin, sdim).astype(np.float32),
        "blk.conv.modulation.bias":
            (rng.randn(cin) * 0.1 + 1).astype(np.float32),
        "blk.noise.weight": np.asarray([0.7], np.float32),
        "blk.activate.bias": (rng.randn(cout) * 0.1).astype(np.float32),
    }
    x = rng.randn(n, cin, hw, hw).astype(np.float32)
    style = rng.randn(n, sdim).astype(np.float32)
    noise = rng.randn(n, 1, 2 * hw, 2 * hw).astype(np.float32)

    with torch.no_grad():
        w = torch.from_numpy(sd["blk.conv.weight"])
        s = _equal_linear(style, sd["blk.conv.modulation.weight"],
                          sd["blk.conv.modulation.bias"])
        scale = np.float32(1 / np.sqrt(cin * k * k))
        weight = scale * w * torch.from_numpy(s).view(n, 1, cin, 1, 1)
        demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
        weight = weight * demod.view(n, cout, 1, 1, 1)
        # upsample path: grouped conv_transpose2d then Blur
        weight = weight.view(n, cout, cin, k, k).transpose(1, 2).reshape(
            n * cin, cout, k, k)
        xt = torch.from_numpy(x).reshape(1, n * cin, hw, hw)
        out = F.conv_transpose2d(xt, weight, stride=2, padding=0, groups=n)
        out = out.view(n, cout, *out.shape[2:])
        # Blur: kernel (1,3,3,1) outer, *4; pads from model.py:196-199
        kern = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
        kern = kern / kern.sum() * 4.0
        p = 2 - (k - 1)
        pad0, pad1 = (p + 1) // 2 + 1, p // 2 + 1
        kt = torch.from_numpy(kern).view(1, 1, 4, 4).repeat(cout, 1, 1, 1)
        out = F.pad(out, (pad0, pad1, pad0, pad1))
        out = F.conv2d(out, kt, groups=cout)
        out = out + 0.7 * torch.from_numpy(noise)
        out = F.leaky_relu(
            out + torch.from_numpy(sd["blk.activate.bias"]).view(1, -1, 1, 1),
            0.2) * np.float32(np.sqrt(2))
    _save("styled_conv_up", {
        **{f"sd:{k_}": v for k_, v in sd.items()},
        "in:x": x, "in:style": style, "in:noise": noise,
        "out:y": out.numpy(),
    })


def make_irse_bottleneck():
    """bottleneck_IR_SE, stride 2, cin != depth (conv shortcut), eval-mode BN
    with randomized running stats (helpers.py:76-119)."""
    import torch.nn as nn

    torch.manual_seed(11)

    class SE(nn.Module):
        def __init__(self, c, reduction=16):
            super().__init__()
            self.fc1 = nn.Conv2d(c, c // reduction, 1, bias=False)
            self.fc2 = nn.Conv2d(c // reduction, c, 1, bias=False)

        def forward(self, x):
            s = F.adaptive_avg_pool2d(x, 1)
            s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
            return x * s

    class Unit(nn.Module):
        def __init__(self, cin, depth, stride):
            super().__init__()
            self.shortcut_layer = nn.Sequential(
                nn.Conv2d(cin, depth, 1, stride, bias=False),
                nn.BatchNorm2d(depth))
            self.res_layer = nn.Sequential(
                nn.BatchNorm2d(cin),
                nn.Conv2d(cin, depth, 3, 1, 1, bias=False), nn.PReLU(depth),
                nn.Conv2d(depth, depth, 3, stride, 1, bias=False),
                nn.BatchNorm2d(depth), SE(depth))

        def forward(self, x):
            return self.res_layer(x) + self.shortcut_layer(x)

    cin, depth = 32, 64
    tm = Unit(cin, depth, 2).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.4)
                m.weight.uniform_(0.7, 1.3)
                m.bias.normal_(0, 0.1)
    sd = {f"unit.{k}": v.numpy().copy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    x = np.random.RandomState(11).rand(2, cin, 16, 16).astype(np.float32)
    with torch.no_grad():
        y = tm(torch.from_numpy(x))
    _save("irse_bottleneck", {
        **{f"sd:{k_}": v for k_, v in sd.items()},
        "in:x": x, "out:y": y.numpy(),
    })


def make_vgg_block1():
    """torchvision-layout vgg16 features[0..3]: conv1_1/ReLU/conv1_2/ReLU —
    the conv_w OIHW->HWIO transpose + the _VGG_IDX table's first entries."""
    torch.manual_seed(13)
    import torch.nn as nn

    tm = nn.Sequential(
        nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU()).eval()
    sd = {f"features.{k}": v.numpy().copy() for k, v in tm.state_dict().items()}
    x = np.random.RandomState(13).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        y = tm(torch.from_numpy(x))
    _save("vgg_block1", {
        **{f"sd:{k_}": v for k_, v in sd.items()},
        "in:x": x, "out:y": y.numpy(),
    })


def make_lpips_lin():
    """The LPIPS lin-head stage over recorded alex-width feature taps:
    unit-normalize on C, squared diff, frozen 1x1 lin conv, spatial mean,
    sum over layers / batch mean (lpips/networks.py:66-95)."""
    rng = np.random.RandomState(17)
    chans = (64, 192, 384, 256, 256)  # alex tap widths
    n, hw = 2, 6
    arrays = {}
    total = 0.0
    with torch.no_grad():
        for i, c in enumerate(chans):
            a = rng.rand(n, c, hw, hw).astype(np.float32)
            b = rng.rand(n, c, hw, hw).astype(np.float32)
            w = rng.rand(1, c, 1, 1).astype(np.float32)
            arrays[f"in:feat{i}_a"] = a
            arrays[f"in:feat{i}_b"] = b
            arrays[f"sd:lin.{i}.1.weight"] = w
            at, bt = torch.from_numpy(a), torch.from_numpy(b)

            def unit(t):
                return t / (torch.sqrt(
                    torch.sum(t ** 2, dim=1, keepdim=True)) + 1e-10)

            d = (unit(at) - unit(bt)) ** 2
            total += F.conv2d(d, torch.from_numpy(w)).mean([2, 3]).sum() / n
    arrays["out:distance"] = np.asarray(float(total), np.float32)
    _save("lpips_lin", arrays)


if __name__ == "__main__":
    make_styled_conv_up()
    make_irse_bottleneck()
    make_vgg_block1()
    make_lpips_lin()
