"""CLI-surface smoke tests: run the actual entry-point scripts as subprocesses
against the synthetic CelebA fixture (reference flag surfaces, tiny configs).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from face_mask_inpaint_tpu.data.synthetic import make_synthetic_celeba

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # the sitecustomize pins axon; JAX_PLATFORMS=cpu is honored when the axon
    # register() call sees it (it re-exports), so also blank the pool override
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env, capture_output=True,
        text=True, timeout=2400,
    )


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_celeba")
    return make_synthetic_celeba(root, n_identities=4, images_per_identity=3,
                                 size=(64, 64))


def test_train_mask_detector_cli(tree, tmp_path):
    ckpt_dir = tmp_path / "ckpts"
    r = run_cli([
        str(REPO / "train_mask_detector.py"),
        "--epochs", "1", "--batch-size", "8", "--scale", "1",
        "--dir_img", str(tree["src_dir"]), "--dir_mask", str(tree["mask_dir"]),
        "--dir_checkpoint", str(ckpt_dir),
    ], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    assert any(p.name.startswith("unet_checkpoint_epoch") for p in ckpt_dir.iterdir())
    logs = (ckpt_dir / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    recs = [json.loads(l) for l in logs]
    assert any("train loss" in rec for rec in recs)


def test_train_reference_fill_cli(tree, tmp_path):
    r = run_cli([
        str(REPO / "train_reference_fill.py"),
        "--epochs", "1", "--batch_size", "8", "--img_scale", "1",
        "--data_root", str(tree["root"]),
        "--src_img_path", "img_align_celeba_masked1",
        "--ref_img_path", "img_align_celeba",
        "--mask_path", "binary_map",
        "--identity_file_path", "identity_CelebA.txt",
        "--run_name", "smoke",
        "--checkpoint_path", str(tmp_path / "saved_model"),
        "--encoder_ngf", "8", "--encoder_z_nc", "16", "--encoder_img_f", "32",
        "--encoder_layers", "3",
        "--decoder_ngf", "16", "--decoder_z_nc", "16", "--decoder_img_f", "64",
        "--decoder_layers", "3",
        "--disc_ndf", "8", "--disc_layers", "3",
        "--use_att", "1", "--out_size", "64",
    ], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    run_dir = tmp_path / "saved_model" / "smoke"
    assert any(p.name.startswith("G_checkpoint_epoch") for p in run_dir.iterdir())
    assert any(p.name.startswith("D_checkpoint_epoch") for p in run_dir.iterdir())
    recs = [json.loads(l) for l in
            (run_dir / "metrics.jsonl").read_text().strip().splitlines()]
    losses = [r["G loss"] for r in recs if "G loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


def test_picnet_inference_cli(tree, tmp_path):
    r = run_cli([
        str(REPO / "PICNet_inference.py"),
        "--data_root", str(tree["root"]),
        "--src_img_path", "img_align_celeba_masked1",
        "--ref_img_path", "img_align_celeba",
        "--mask_path", "binary_map",
        "--identity_file_path", "identity_CelebA.txt",
        "--mask_detector_path", "",
        "--pt_ckpt_path", str(tmp_path / "nonexistent" / "ckpt"),
        "--batch_size", "4",
        "--encoder_ngf", "8", "--encoder_z_nc", "16", "--encoder_img_f", "32",
        "--encoder_layers", "3",
        "--decoder_ngf", "16", "--decoder_z_nc", "16", "--decoder_img_f", "64",
        "--decoder_layers", "3",
        "--use_att", "1", "--save_src_mask", "1", "--out_size", "64",
    ], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    out_dir = tmp_path / "test_results" / "nonexistent"
    gens = list(out_dir.glob("gen_*.jpg"))
    masks = list(out_dir.glob("mask_*.jpg"))
    assert len(gens) == tree["n_images"]
    assert len(masks) == tree["n_images"]
    csv = (out_dir / "metrics.csv").read_text()
    assert "ssim" in csv


def test_psp_inference_cli(tree, tmp_path):
    # dataset scale is fixed at 0.25 and the face pool outputs 256², so the
    # GT must be 1024² for the metric shapes to line up (as on CelebA-HQ)
    big = make_synthetic_celeba(tmp_path / "data", n_identities=2,
                                images_per_identity=2, size=(1024, 1024))
    r = run_cli([
        str(REPO / "psp_inference.py"),
        "--data_root", str(big["root"]),
        "--src_img_path", "img_align_celeba_masked1",
        "--ref_img_path", "img_align_celeba",
        "--mask_path", "binary_map",
        "--identity_file_path", "identity_CelebA.txt",
        "--mask_detector_path", "",
        "--pt_ckpt_path", str(tmp_path / "none" / "ckpt"),
        "--batch_size", "2", "--output_size", "64", "--use_ref",
        "--start_from_latent_avg",
        # exercise the split-jit path (auto only enables it on remote-compile
        # backends; the fused path is covered by the gradio/train CLI tests)
        "--split_jit", "1",
    ], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    out_dir = tmp_path / "test_results" / "none"
    assert len(list(out_dir.glob("gen_*.jpg"))) == big["n_images"]
    assert (out_dir / "metrics.csv").exists()


def test_test_evaluate_cli(tree, tmp_path):
    # fabricate a test_results folder from the fixture's own GT images
    out = tmp_path / "results"
    out.mkdir()
    from PIL import Image
    for p in Path(tree["ref_dir"]).glob("*.jpg"):
        img = Image.open(p)
        img.save(out / f"gen_{p.stem}.jpg")
    r = run_cli([
        str(REPO / "test_evaluate.py"),
        "--data_root", str(tree["root"]),
        "--gt_img_path", "img_align_celeba",
        "--test_folder", str(out),
        "--eval_options", "ssim",
        "--gt_scale", "1",
    ], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    csv = (out / "metrics.csv").read_text()
    # identical images -> ssim ~ 1 (jpeg round-trip noise allowed)
    ssim_val = float(csv.strip().splitlines()[1].split(",")[0])
    assert ssim_val > 0.9


def test_gradio_serve_selftest(tmp_path):
    r = run_cli([
        str(REPO / "gradio_serve.py"), "--selftest",
        "--pt_ckpt_path", "missing", "--mask_detector_path", "",
        "--output_size", "64",
    ], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "selftest ok" in r.stdout


def test_train_psp_cli(tmp_path):
    # 256² data with img_scale 1: encoder inputs and face-pooled outputs are
    # both 256², matching the loss shapes (as CelebA-HQ @ 0.25 does)
    data = make_synthetic_celeba(tmp_path / "data", n_identities=4,
                                 images_per_identity=3, size=(256, 256))
    r = run_cli([
        str(REPO / "train_psp.py"),
        "--epochs", "1", "--batch_size", "8", "--img_scale", "1",
        "--data_root", str(data["root"]),
        "--src_img_path", "img_align_celeba_masked1",
        "--ref_img_path", "img_align_celeba",
        "--mask_path", "binary_map",
        "--identity_file_path", "identity_CelebA.txt",
        "--run_name", "psp_smoke",
        "--checkpoint_path", str(tmp_path / "saved_model"),
        "--output_size", "64", "--use_ref", "--start_from_latent_avg",
        "--lpips_lambda", "0", "--l2_lambda", "1", "--style_lambda", "0",
        "--cx_lambda", "0", "--id_lambda", "0",
    ], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    run_dir = tmp_path / "saved_model" / "psp_smoke"
    assert any(p.name.startswith("G_checkpoint_epoch") for p in run_dir.iterdir())
    recs = [json.loads(l) for l in
            (run_dir / "metrics.jsonl").read_text().strip().splitlines()]
    losses = [rec["loss"] for rec in recs if "loss" in rec]
    assert losses and all(np.isfinite(l) for l in losses)
