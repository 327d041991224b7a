"""Microbench: MaskDetector at bs16/256²/bf16 on the current backend.

Chains outputs into inputs (relay memoization, ROUND2_NOTES item 1).
Optionally wraps in jax.profiler trace: TRACE_DIR=/tmp/det_trace.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.models.unet import MaskDetector

BS = int(os.environ.get("BS", "16"))
HW = 256
STEPS = int(os.environ.get("STEPS", "20"))


def main():
    det = MaskDetector(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(BS, HW, HW, 3), jnp.float32)
    vs = jax.jit(det.init)(key, x)

    @jax.jit
    def step(img):
        m = det.apply(vs, img, method=MaskDetector.predict_mask)
        return jnp.clip(img * 0.999 + m[..., None] * 1e-3, 0.0, 1.0)

    y = step(x)
    jax.block_until_ready(y)
    for _ in range(3):
        y = step(y)
    jax.block_until_ready(y)

    trace_dir = os.environ.get("TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
            for _ in range(5):
                y = step(y)
            jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        y = step(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"detector bs{BS}: {dt*1e3:.2f} ms/step, {BS/dt:.1f} imgs/s")


if __name__ == "__main__":
    main()
