"""TPU microbench: dense packed convT pair vs the Pallas stencil kernel.

Stage-4 flagship shapes: x 64ch, h 32ch at 512² held r=2-packed on a 256²
grid, output 32ch at 1024² (r=4-packed); bs16 bf16.
Also stage-3: r_in=1 at 256², x 128ch, h 64ch -> 64ch.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.ops.packed import packed_conv_transpose2x
from face_mask_inpaint_tpu.ops.pallas.packed_convt import packed_convt_pair


def timeit(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    prev = args
    for _ in range(iters):
        out = fn(*prev)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run(tag, n, hp, r_in, cx, ch, co):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, hp, hp, r_in * r_in * cx), jnp.bfloat16)
    h = jnp.asarray(rs.randn(n, hp, hp, r_in * r_in * ch), jnp.bfloat16)
    wx = jnp.asarray(rs.randn(3, 3, cx, co) * 0.1, jnp.bfloat16)
    wh = jnp.asarray(rs.randn(3, 3, ch, co) * 0.1, jnp.bfloat16)
    bx = jnp.asarray(rs.randn(co), jnp.bfloat16)
    bh = jnp.asarray(rs.randn(co), jnp.bfloat16)

    dense = jax.jit(lambda a, b: packed_conv_transpose2x(a, wx, bx, r_in)
                    + packed_conv_transpose2x(b, wh, bh, r_in))
    pallas = jax.jit(lambda a, b: packed_convt_pair(
        [(a, wx, bx), (b, wh, bh)], r_in))

    err = float(jnp.max(jnp.abs(
        dense(x, h).astype(jnp.float32) - pallas(x, h).astype(jnp.float32))))
    td = timeit(dense, (x, h)) * 1e3
    tp = timeit(pallas, (x, h)) * 1e3
    true_gflop = (n * (2 * r_in * hp) ** 2 * 2.25 * (cx + ch) * co * 2) / 1e9
    print(f"{tag}: dense {td:.2f} ms | pallas {tp:.2f} ms | "
          f"err {err:.3f} | true {true_gflop:.0f} GFLOP -> "
          f"{true_gflop / tp:.0f} TFLOP/s effective")


if __name__ == "__main__":
    run("stage4 (r_in=2, 64+32 -> 32 @1024²)", 16, 256, 2, 64, 32, 32)
    run("stage3 (r_in=1, 128+64 -> 64 @512²)", 16, 256, 1, 128, 64, 64)
