#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Primary metric (BASELINE.json): CelebA-HQ 256² inpaint images/sec/chip on the
flagship reference-guided PICNet path (mask detector -> ReferenceFill with
example-guided attention + the decoder's 128²-token self-attention), bf16
compute.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is the driver's stated target — 5x an estimated A100 torch
throughput for this model (ESTIMATED_A100_IMGS_PER_SEC below: ~210 GFLOPs/img
forward plus the 137 GFLOP/img f32 Auto_Attn map at the measured-in-practice
~30% utilization of eager torch convnets on A100 ≈ 440 imgs/s).
vs_baseline = measured / (5 * estimate); >= 1.0 means the 5x target is met.

Environment knobs: BENCH_BS (batch, default 16), BENCH_STEPS (default 20),
BENCH_SWEEP=1 to sweep batch sizes (each size costs a ~2 min XLA compile
through this box's remote-compile relay, so the default is a single size).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

ESTIMATED_A100_IMGS_PER_SEC = 440.0
TARGET_MULTIPLIER = 5.0


def bench_flagship(batch_size: int, steps: int = 20, warmup: int = 3,
                   dtype=jnp.bfloat16):
    from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
    from face_mask_inpaint_tpu.models.unet import MaskDetector

    hw = 256
    enc = dict(type="pluralistic", ngf=32, z_nc=128, img_f=128, L=6, layers=5,
               norm="none", activation="LeakyReLU", init_type="orthogonal")
    dec = dict(ngf=32, z_nc=128, img_f=256, L=0, layers=5, norm="instance",
               activation="LeakyReLU", init_type="orthogonal")
    model = ReferenceFill(encoder_params=enc, decoder_params=dec, use_att=True,
                          out_size=(hw, hw), dtype=dtype)
    detector = MaskDetector(dtype=dtype)

    key = jax.random.PRNGKey(0)
    src = jnp.asarray(np.random.RandomState(0).rand(batch_size, hw, hw, 3),
                      jnp.float32)
    ref = jnp.asarray(np.random.RandomState(1).rand(batch_size, hw, hw, 3),
                      jnp.float32)
    mask0 = jnp.zeros((batch_size, hw, hw), jnp.float32)
    # jit the inits: eager init dispatches hundreds of single ops through the
    # device (minutes on a remote-compile TPU); jitted it is one program.
    md_vars = jax.jit(detector.init)(key, src)
    g_vars = jax.jit(
        lambda k, s, r, m: model.init(
            {"params": k, "sample": k}, s, r, m, train=False)
    )(key, src, ref, mask0)

    @jax.jit
    def infer(src_img, ref_img):
        m = detector.apply(md_vars, src_img, method=MaskDetector.predict_mask)
        return model.apply(g_vars, src_img, ref_img, m, train=False,
                           rngs={"sample": jax.random.PRNGKey(0)})

    infer(src, ref).block_until_ready()
    for _ in range(warmup):
        infer(src, ref).block_until_ready()

    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = infer(src, ref)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    if os.environ.get("BENCH_SWEEP") == "1":
        sizes = (8, 16, 32)
    else:
        sizes = (int(os.environ.get("BENCH_BS", "16")),)
    best, best_bs = 0.0, 0
    for bs in sizes:
        try:
            ips = bench_flagship(bs, steps=steps)
        except Exception:
            break
        if ips > best:
            best, best_bs = ips, bs
        elif len(sizes) > 1:
            break
    target = ESTIMATED_A100_IMGS_PER_SEC * TARGET_MULTIPLIER
    print(json.dumps({
        "metric": "celebahq256_refguided_inpaint_inference",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / target, 4),
        "batch_size": best_bs,
    }))


if __name__ == "__main__":
    main()
