"""Gated end-to-end parity report against REAL pretrained checkpoints.

The north star for the rebuild is metric parity with the reference's
published evaluation flow (/root/reference/README.md:47-78): convert the
.pth assets, run the two inference CLIs on a fixture set, report
SSIM/MS-SSIM (+FID vs a ground-truth image dir), and — when recorded torch
activations are supplied — per-module max-abs diffs. This container has no
egress, so the harness is asset-gated: point it at a directory with the
real checkpoints the moment they exist and one command produces the report.

Usage:
  python -m face_mask_inpaint_tpu.tools.parity_report \
      --assets /path/to/pth_dir \
      [--data_root /path/to/CelebAHQ-fixtures] \
      [--activations recorded_torch_acts.npz] \
      [--out parity_report.json]

Asset discovery (filename patterns, first match wins):
  mask detector   *mask_detector*.pth | MODEL.pth      -> convert_unet
  PICNet G/E/D    latest_net_G/E/D.pth                 -> convert_picnet_module
  PICNet trained  *PICNet*G_checkpoint*.pth            -> convert_picnet_module
  pSp combined    *psp*G_checkpoint*.pth | *pSp*.pth   -> convert_psp
  ArcFace         model_ir_se50.pth                    -> convert_irse_backbone
  StyleGAN2 FFHQ  stylegan2-ffhq-config-f.pt           -> convert_stylegan2_generator
  VGG16           vgg16*.pth                           -> convert_vgg16_features
  InceptionV3     *inception*.pth                      -> convert_inception_v3 (enables FID)
  LPIPS lin heads <net>.pth next to torchvision trunk  -> convert_lpips

Recorded-activation format (.npz produced from the reference): pairs
  "<module>:input"  NCHW float array fed to the torch module
  "<module>:output" NCHW float array it produced
for module in {mask_detector, irse, psp}. (PICNet's generator samples z
internally, so activation parity for it is covered by the in-test torch
oracles in tests/test_converter_numeric.py instead; its end-to-end parity
shows up in the SSIM/MS-SSIM/FID rows here.)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

_PATTERNS = [
    ("mask_detector", ["*mask_detector*.pth", "MODEL.pth"]),
    ("picnet_g", ["latest_net_G.pth", "*PICNet*G_checkpoint*.pth"]),
    ("picnet_e", ["latest_net_E.pth"]),
    ("picnet_d", ["latest_net_D.pth"]),
    ("psp", ["*psp*G_checkpoint*.pth", "*pSp*.pth", "*RefpSp*.pth"]),
    ("ir_se50", ["model_ir_se50.pth"]),
    ("stylegan2_ffhq", ["stylegan2-ffhq-config-f.pt"]),
    ("vgg16", ["vgg16*.pth"]),
    ("inception_v3", ["*inception*.pth", "*inception*.pt"]),
]


def discover(assets_dir: str) -> dict:
    found = {}
    for name, pats in _PATTERNS:
        for pat in pats:
            hits = sorted(glob.glob(os.path.join(assets_dir, "**", pat),
                                    recursive=True))
            if hits:
                found[name] = hits[0]
                break
    return found


def _tree_stats(tree) -> dict:
    import jax

    leaves = jax.tree.leaves(tree)
    return {
        "n_arrays": len(leaves),
        "n_params": int(sum(np.asarray(a).size for a in leaves)),
    }


def convert_all(found: dict, report: dict) -> dict:
    """Convert every discovered asset; returns {name: variables}."""
    from face_mask_inpaint_tpu.tools import convert_torch as ct

    converted = {}
    for name, path in found.items():
        entry = {"path": path}
        try:
            sd = ct.load_torch_state_dict(path)
            if name == "mask_detector":
                out = ct.convert_unet(sd)
            elif name in ("picnet_g", "picnet_e", "picnet_d"):
                out = ct.convert_picnet_module(sd)
            elif name == "psp":
                out = ct.convert_psp(sd)
            elif name == "ir_se50":
                out = ct.convert_irse_backbone(sd)
            elif name == "stylegan2_ffhq":
                out = ct.convert_stylegan2_generator(sd)
            elif name == "vgg16":
                out = ct.convert_vgg16_features(sd)
            elif name == "inception_v3":
                out = ct.convert_inception_v3(sd)
            else:
                continue
            entry.update(status="converted", **_tree_stats(out))
            converted[name] = out
        except Exception as e:  # report, don't abort the whole run
            entry.update(status="error", error=f"{type(e).__name__}: {e}")
        report["convert"][name] = entry
    for name, _ in _PATTERNS:
        if name not in found:
            report["convert"][name] = {"status": "asset missing"}
    return converted


def activation_parity(npz_path: str, converted: dict, report: dict) -> None:
    """Per-module max-abs diff vs recorded torch activations (NCHW in npz)."""
    import jax.numpy as jnp

    data = np.load(npz_path)
    mods = sorted({k.split(":")[0] for k in data.files if ":" in k})
    for mod in mods:
        try:
            x = np.asarray(data[f"{mod}:input"], np.float32)
            want = np.asarray(data[f"{mod}:output"], np.float32)
            x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
            if mod == "mask_detector" and "mask_detector" in converted:
                from face_mask_inpaint_tpu.models.unet import MaskDetector

                got = MaskDetector().apply(
                    converted["mask_detector"], x_nhwc, mode="train",
                    train=False)
                got = np.asarray(got).transpose(0, 3, 1, 2)
            elif mod == "irse" and "ir_se50" in converted:
                from face_mask_inpaint_tpu.models.irse import Backbone

                got = Backbone(input_size=112, num_layers=50, mode="ir_se").apply(
                    converted["ir_se50"], x_nhwc, train=False)
                got = np.asarray(got)
                want = want.reshape(got.shape)
            elif mod == "psp" and "psp" in converted:
                from face_mask_inpaint_tpu.models.psp import PSP

                got = PSP(output_size=1024, start_from_latent_avg=True).apply(
                    converted["psp"], x_nhwc, resize=True,
                    randomize_noise=False, train=False)
                got = np.asarray(got).transpose(0, 3, 1, 2)
            else:
                report["activations"][mod] = {"status": "no converter/asset"}
                continue
            diff = np.abs(got.astype(np.float64) - want.astype(np.float64))
            denom = np.maximum(np.abs(want), 1e-3)
            report["activations"][mod] = {
                "status": "ok",
                "max_abs_diff": float(diff.max()),
                "max_rel_diff": float((diff / denom).max()),
                "mean_abs_diff": float(diff.mean()),
            }
        except Exception as e:
            report["activations"][mod] = {
                "status": "error", "error": f"{type(e).__name__}: {e}"}


def _load_fixture(path: str):
    """Split a fixture .npz into (torch-layout state dict, inputs, outputs)
    per the key convention of tests/fixtures/make_parity_fixtures.py."""
    data = np.load(path)
    sd = {k[3:]: np.asarray(data[k]) for k in data.files if k.startswith("sd:")}
    ins = {k[3:]: np.asarray(data[k]) for k in data.files if k.startswith("in:")}
    outs = {k[4:]: np.asarray(data[k]) for k in data.files if k.startswith("out:")}
    return sd, ins, outs


def _fixture_styled_conv_up(sd, ins):
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.models.stylegan2 import StyledConv
    from face_mask_inpaint_tpu.tools import convert_torch as ct

    params = jax.tree.map(jnp.asarray, ct._styled_conv(sd, "blk"))
    cout, k = sd["blk.conv.weight"].shape[1], sd["blk.conv.weight"].shape[3]
    got = StyledConv(cout, k, upsample=True).apply(
        {"params": params},
        jnp.asarray(ins["x"].transpose(0, 2, 3, 1)),
        jnp.asarray(ins["style"]),
        noise=jnp.asarray(ins["noise"].transpose(0, 2, 3, 1)))
    return np.asarray(got).transpose(0, 3, 1, 2)


def _fixture_irse_bottleneck(sd, ins):
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.models.irse import BottleneckIR
    from face_mask_inpaint_tpu.tools import convert_torch as ct

    params, stats = ct._split_bn(ct._irse_unit(sd, "unit"))
    variables = jax.tree.map(
        jnp.asarray, {"params": params, "batch_stats": stats})
    depth = sd["unit.res_layer.1.weight"].shape[0]
    got = BottleneckIR(depth=depth, stride=2, use_se=True).apply(
        variables, jnp.asarray(ins["x"].transpose(0, 2, 3, 1)), train=False)
    return np.asarray(got).transpose(0, 3, 1, 2)


def _fixture_vgg_block1(sd, ins):
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.nn.layers import Conv2d
    from face_mask_inpaint_tpu.tools import convert_torch as ct

    # same index->name mapping as convert_vgg16_features' first block
    params = {
        name: {"kernel": ct.conv_w(sd[f"features.{idx}.weight"]),
               "bias": sd[f"features.{idx}.bias"]}
        for name, idx in (("conv1_1", 0), ("conv1_2", 2))}

    class _Block1(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = jax.nn.relu(Conv2d(64, 3, padding=1, name="conv1_1")(x))
            return jax.nn.relu(Conv2d(64, 3, padding=1, name="conv1_2")(x))

    got = _Block1().apply({"params": jax.tree.map(jnp.asarray, params)},
                          jnp.asarray(ins["x"].transpose(0, 2, 3, 1)))
    return np.asarray(got).transpose(0, 3, 1, 2)


def _fixture_lpips_lin(sd, ins):
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.losses.lpips import _normalize_activation
    from face_mask_inpaint_tpu.tools import convert_torch as ct

    total = jnp.float32(0.0)
    i = 0
    while f"feat{i}_a" in ins:
        a = jnp.asarray(ins[f"feat{i}_a"].transpose(0, 2, 3, 1))
        b = jnp.asarray(ins[f"feat{i}_b"].transpose(0, 2, 3, 1))
        kern = jnp.asarray(ct.conv_w(sd[f"lin.{i}.1.weight"]))  # [1,1,c,1]
        d = (_normalize_activation(a) - _normalize_activation(b)) ** 2
        lin = jnp.einsum("nhwc,c->nhw", d, kern[0, 0, :, 0])
        total = total + jnp.sum(jnp.mean(lin, axis=(1, 2))) / a.shape[0]
        i += 1
    return np.asarray(total)


_FIXTURE_RUNNERS = {
    "styled_conv_up": _fixture_styled_conv_up,
    "irse_bottleneck": _fixture_irse_bottleneck,
    "vgg_block1": _fixture_vgg_block1,
    "lpips_lin": _fixture_lpips_lin,
}

# committed fixtures live here; --module_fixtures overrides
DEFAULT_FIXTURE_DIR = os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "..", "tests", "fixtures", "parity"))


def module_fixture_parity(fix_dir: str, report: dict) -> None:
    """Per-module max-abs diff vs the committed recorded-torch fixtures
    (tests/fixtures/parity/*.npz) — the asset-free counterpart of
    activation_parity. Populates report['module_fixtures']."""
    out = report.setdefault("module_fixtures", {})
    for name, runner in _FIXTURE_RUNNERS.items():
        path = os.path.join(fix_dir, f"{name}.npz")
        if not os.path.exists(path):
            out[name] = {"status": "fixture missing", "path": path}
            continue
        try:
            sd, ins, outs = _load_fixture(path)
            got = runner(sd, ins)
            want = outs["y"] if "y" in outs else outs["distance"]
            diff = np.abs(got.astype(np.float64) - want.astype(np.float64))
            denom = np.maximum(np.abs(want.astype(np.float64)), 1e-3)
            out[name] = {
                "status": "ok",
                "max_abs_diff": float(diff.max()),
                "max_rel_diff": float((diff / denom).max()),
                "mean_abs_diff": float(diff.mean()),
            }
        except Exception as e:
            out[name] = {"status": "error",
                         "error": f"{type(e).__name__}: {e}"}


_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def _read_metrics_csv(path: str) -> dict:
    with open(path) as f:
        lines = [ln.strip().split(",") for ln in f if ln.strip()]
    return dict(zip(lines[0], lines[-1]))


def _run_cli(cmd: list[str], report: dict, key: str, workdir: str,
             gt_dir: str | None, inception_pth: str | None) -> None:
    """Run an inference CLI in `workdir`; the CLIs write their generated
    images + in-loop SSIM/MS-SSIM to <cwd>/test_results/<run_name>/. Then
    run the dataset-level evaluator (test_evaluate.py) over the saved
    images vs gt_dir — SSIM/MS-SSIM always, FID when inception weights
    were discovered."""
    entry: dict = {"cmd": " ".join(cmd)}
    env = dict(os.environ, PYTHONPATH=_REPO_ROOT + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=3600, cwd=workdir, env=env)
        entry["returncode"] = proc.returncode
        if proc.returncode != 0:
            entry["stderr_tail"] = proc.stderr[-2000:]
        gen_dirs = sorted(
            d for d in glob.glob(os.path.join(workdir, "test_results", "*"))
            if os.path.isdir(d))
        if gen_dirs:
            entry["gen_dir"] = gen_dirs[-1]
            csv = os.path.join(gen_dirs[-1], "metrics.csv")
            if os.path.exists(csv):
                entry["in_loop_metrics"] = _read_metrics_csv(csv)
        if gt_dir and gen_dirs:
            opts = ["ssim", "ms_ssim"] + (["fid"] if inception_pth else [])
            ev = [sys.executable, os.path.join(_REPO_ROOT, "test_evaluate.py"),
                  "--data_root", os.path.dirname(os.path.abspath(gt_dir)),
                  "--gt_img_path", os.path.basename(gt_dir),
                  "--test_folder", gen_dirs[-1],
                  "--eval_options", *opts]
            if inception_pth:
                ev += ["--inception_weights", inception_pth]
            proc2 = subprocess.run(ev, capture_output=True, text=True,
                                   timeout=3600, cwd=workdir, env=env)
            entry["eval_returncode"] = proc2.returncode
            if proc2.returncode != 0:
                entry["eval_stderr_tail"] = proc2.stderr[-2000:]
            csv = os.path.join(gen_dirs[-1], "metrics.csv")
            if os.path.exists(csv):
                entry["dataset_metrics"] = _read_metrics_csv(csv)
    except Exception as e:
        entry["error"] = f"{type(e).__name__}: {e}"
    report["inference"][key] = entry


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--assets", required=True,
                    help="directory containing the real .pth checkpoints")
    ap.add_argument("--data_root", default=None,
                    help="CelebA(HQ)-style fixture tree for the inference CLIs")
    ap.add_argument("--src_img_path", default="images_masked_test")
    ap.add_argument("--ref_img_path", default="images")
    ap.add_argument("--mask_path", default="binary_map")
    ap.add_argument("--identity_file_path", default="CelebA-HQ-identity.txt")
    ap.add_argument("--gt_dir", default=None,
                    help="ground-truth image dir for FID (defaults to "
                         "<data_root>/<ref_img_path>)")
    ap.add_argument("--activations", default=None,
                    help=".npz of recorded torch activations")
    ap.add_argument("--out", default="parity_report.json")
    ap.add_argument("--skip_inference", action="store_true")
    args = ap.parse_args(argv)

    report = {"assets_dir": args.assets, "convert": {}, "activations": {},
              "inference": {}}
    found = discover(args.assets)
    converted = convert_all(found, report)

    if args.activations:
        activation_parity(args.activations, converted, report)

    if args.data_root and not args.skip_inference:
        gt = os.path.abspath(args.gt_dir or
                             os.path.join(args.data_root, args.ref_img_path))
        inception = found.get("inception_v3")
        data_flags = [
            "--data_root", os.path.abspath(args.data_root),
            "--src_img_path", args.src_img_path,
            "--ref_img_path", args.ref_img_path,
            "--mask_path", args.mask_path,
            "--identity_file_path", args.identity_file_path,
        ]
        if "picnet_g" in found and "mask_detector" in found:
            _run_cli(
                [sys.executable, os.path.join(_REPO_ROOT, "PICNet_inference.py"),
                 *data_flags,
                 "--mask_detector_path", os.path.abspath(found["mask_detector"]),
                 "--pt_ckpt_path", os.path.abspath(found["picnet_g"]),
                 "--img_scale", "0.25", "--use_att", "1", "--batch_size", "4",
                 "--decoder_img_f", "256", "--decoder_z_nc", "256"],
                report, "picnet",
                tempfile.mkdtemp(prefix="parity_picnet_"), gt, inception)
        if "psp" in found and "mask_detector" in found:
            _run_cli(
                [sys.executable, os.path.join(_REPO_ROOT, "psp_inference.py"),
                 *data_flags,
                 "--mask_detector_path", os.path.abspath(found["mask_detector"]),
                 "--pt_ckpt_path", os.path.abspath(found["psp"]),
                 "--use_ref", "--use_attention", "1", "--batch_size", "4"],
                report, "psp",
                tempfile.mkdtemp(prefix="parity_psp_"), gt, inception)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    ok = [k for k, v in report["convert"].items() if v.get("status") == "converted"]
    missing = [k for k, v in report["convert"].items()
               if v.get("status") == "asset missing"]
    print(f"parity report -> {args.out}: {len(ok)} converted "
          f"({', '.join(ok) or 'none'}); missing: {', '.join(missing) or 'none'}")
    for k, v in report["inference"].items():
        print(f"  {k}: in_loop={v.get('in_loop_metrics')} "
              f"dataset={v.get('dataset_metrics')}")
    for k, v in report["activations"].items():
        print(f"  act {k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
