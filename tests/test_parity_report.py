"""Gated end-to-end parity harness (VERDICT r3 item 7).

The full run needs the real pretrained .pth assets from the reference's
README (/root/reference/README.md:47-78) — unavailable in this container
(no egress). Point FMI_PARITY_ASSETS at a directory containing them and
the gated test produces the SSIM/MS-SSIM/FID parity report; without it,
only the harness plumbing (discovery, report shape, missing-asset paths)
is exercised.
"""

import json
import os

import pytest

from face_mask_inpaint_tpu.tools import parity_report

ASSETS = os.environ.get("FMI_PARITY_ASSETS", "")


def test_harness_smoke_empty_assets(tmp_path):
    """No assets: every inventory row reports 'asset missing', report is
    written, exit code 0 — the harness itself must not require assets."""
    out = tmp_path / "report.json"
    rc = parity_report.main(
        ["--assets", str(tmp_path), "--out", str(out), "--skip_inference"])
    assert rc == 0
    report = json.loads(out.read_text())
    names = [n for n, _ in parity_report._PATTERNS]
    assert set(report["convert"]) == set(names)
    assert all(v["status"] == "asset missing"
               for v in report["convert"].values())
    assert report["inference"] == {} and report["activations"] == {}


def test_discover_prefers_first_pattern(tmp_path):
    (tmp_path / "latest_net_G.pth").write_bytes(b"x")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "model_ir_se50.pth").write_bytes(b"x")
    found = parity_report.discover(str(tmp_path))
    assert found["picnet_g"].endswith("latest_net_G.pth")
    assert found["ir_se50"].endswith("model_ir_se50.pth")
    assert "psp" not in found


def test_offline_module_fixture_parity():
    """NON-gated converter parity: the committed recorded-torch fixtures
    (tests/fixtures/parity/*.npz, VERDICT r4 item 5) must reproduce through
    the JAX modules + converter mappings within float tolerance — covers
    ModulatedConv2d+Blur (StyledConv upsample), one IR-SE bottleneck, VGG
    block 1, and the LPIPS lin-head stage without any real assets."""
    report = {}
    parity_report.module_fixture_parity(
        parity_report.DEFAULT_FIXTURE_DIR, report)
    rows = report["module_fixtures"]
    assert set(rows) == set(parity_report._FIXTURE_RUNNERS)
    tol = {"styled_conv_up": 5e-4, "irse_bottleneck": 5e-4,
           "vgg_block1": 2e-4, "lpips_lin": 1e-5}
    for name, row in rows.items():
        assert row["status"] == "ok", (name, row)
        assert row["max_abs_diff"] < tol[name], (name, row)


def test_module_fixtures_missing_dir_reports(tmp_path):
    report = {}
    parity_report.module_fixture_parity(str(tmp_path), report)
    assert all(v["status"] == "fixture missing"
               for v in report["module_fixtures"].values())


@pytest.mark.skipif(not os.path.isdir(ASSETS),
                    reason="set FMI_PARITY_ASSETS to the real .pth dir")
def test_full_parity_report(tmp_path):
    out = tmp_path / "report.json"
    argv = ["--assets", ASSETS, "--out", str(out)]
    data_root = os.environ.get("FMI_PARITY_DATA_ROOT")
    if data_root:
        argv += ["--data_root", data_root]
    acts = os.environ.get("FMI_PARITY_ACTIVATIONS")
    if acts:
        argv += ["--activations", acts]
    assert parity_report.main(argv) == 0
    report = json.loads(out.read_text())
    converted = [k for k, v in report["convert"].items()
                 if v.get("status") == "converted"]
    assert converted, f"no asset converted: {report['convert']}"
    for k, v in report["convert"].items():
        assert v.get("status") != "error", (k, v)
