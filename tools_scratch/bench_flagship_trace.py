"""Trace the full flagship step (mask detector + ReferenceFill) at bs16."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from bench import _flagship_models
from face_mask_inpaint_tpu.models.unet import MaskDetector

BS = int(os.environ.get("BS", "16"))
HW = 256


def main():
    model, detector = _flagship_models(jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    src = jnp.asarray(np.random.RandomState(0).rand(BS, HW, HW, 3), jnp.float32)
    ref = jnp.asarray(np.random.RandomState(1).rand(BS, HW, HW, 3), jnp.float32)
    md_vars = jax.jit(detector.init)(key, src)
    g_vars = jax.jit(
        lambda k, s, r, m: model.init(
            {"params": k, "sample": k}, s, r, m, train=False)
    )(key, src, ref, jnp.zeros((BS, HW, HW), jnp.float32))

    @jax.jit
    def step(src_img):
        m = detector.apply(md_vars, src_img, method=MaskDetector.predict_mask)
        out = model.apply(g_vars, src_img, ref, m, train=False,
                          rngs={"sample": jax.random.PRNGKey(0)})
        return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)

    y = step(src)
    jax.block_until_ready(y)
    for _ in range(3):
        y = step(y)
    jax.block_until_ready(y)
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/flag_trace")
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for _ in range(5):
            y = step(y)
        jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(10):
        y = step(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / 10
    print(f"flagship bs{BS}: {dt*1e3:.2f} ms/step, {BS/dt:.1f} imgs/s")


if __name__ == "__main__":
    main()
