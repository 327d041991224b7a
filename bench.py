#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Primary metric (BASELINE.json): CelebA-HQ 256² inpaint images/sec/chip on the
flagship reference-guided PICNet path (mask detector -> ReferenceFill with
example-guided attention), batch-size swept for best steady-state throughput.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is the driver's stated target — 5x an estimated A100 torch
throughput for this model (ESTIMATED_A100_IMGS_PER_SEC below, derived from
the model's ~210 GFLOPs/img forward at the measured-in-practice ~30% A100
utilization for eager torch convnets ≈ 440 imgs/s). vs_baseline = measured /
(5 * estimate); >= 1.0 means the 5x-per-chip target is met.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

ESTIMATED_A100_IMGS_PER_SEC = 440.0
TARGET_MULTIPLier = 5.0


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
    md_vars = detector.init(key, src)
    g_vars = model.init({"params": key, "sample": key}, src, ref, mask0,
                        train=False)

    @jax.jit
    def infer(src_img, ref_img):
        m = detector.apply(md_vars, src_img, method=MaskDetector.predict_mask)
        return model.apply(g_vars, src_img, ref_img, m, train=False,
                           rngs={"sample": jax.random.PRNGKey(0)})

    # compile + warmup
    out = infer(src, ref)
    out.block_until_ready()
    for _ in range(warmup):
        infer(src, ref).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(steps):
        out = infer(src, ref)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    best = 0.0
    best_bs = 0
    for bs in (8, 16, 32):
        try:
            ips = bench_flagship(bs)
        except Exception:
            break
        if ips > best:
            best, best_bs = ips, bs
        else:
            break  # throughput curve turned over
    target = ESTIMATED_A100_IMGS_PER_SEC * TARGET_MULTIPLier
    print(json.dumps({
        "metric": "celebahq256_refguided_inpaint_inference",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / target, 4),
        "batch_size": best_bs,
    }))


if __name__ == "__main__":
    main()
