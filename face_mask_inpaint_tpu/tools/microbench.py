"""Microbenchmarks for the hot ops on the current backend.

Measures achieved HBM bandwidth / FLOPs for: upfirdn2d (the lax fused-conv
formulation), fused_leaky_relu, blockwise attention, modulated conv, and the
matmul-resizers — the data that decides which ops earn a handwritten Pallas
kernel. Run: python -m face_mask_inpaint_tpu.tools.microbench
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_upfirdn(n=8, h=512, w=512, c=64, dtype=jnp.bfloat16):
    from face_mask_inpaint_tpu.ops.upfirdn2d import make_kernel, upfirdn2d

    x = jnp.ones((n, h, w, c), dtype)
    k = make_kernel([1, 3, 3, 1])
    results = {}
    for name, kwargs, out_scale in (
        ("blur", dict(up=1, down=1, pad=(2, 1)), 1.0),
        ("up2", dict(up=2, down=1, pad=(2, 1)), 4.0),
        ("down2", dict(up=1, down=2, pad=(2, 2)), 0.25),
    ):
        f = jax.jit(lambda x, kw=kwargs: upfirdn2d(x, k, **kw))
        dt = _timeit(f, x)
        bytes_moved = x.size * x.dtype.itemsize * (1 + out_scale)
        results[name] = (dt * 1e3, bytes_moved / dt / 1e9)
    return results


def bench_fused_act(n=8, h=512, w=512, c=64, dtype=jnp.bfloat16):
    from face_mask_inpaint_tpu.ops.fused_act import fused_leaky_relu

    x = jnp.ones((n, h, w, c), dtype)
    b = jnp.ones((c,), dtype)
    f = jax.jit(fused_leaky_relu)
    dt = _timeit(f, x, b)
    return dt * 1e3, 2 * x.size * x.dtype.itemsize / dt / 1e9


def bench_attention(n=1, l=16384, d=32, c=256, dtype=jnp.bfloat16):
    from face_mask_inpaint_tpu.ops.attention import blockwise_attention

    q = jnp.ones((n, l, d), dtype)
    v = jnp.ones((n, l, c), dtype)
    f = jax.jit(lambda q, v: blockwise_attention(q, q, [v], block_size=2048)[0])
    dt = _timeit(f, q, v, iters=5)
    flops = 2 * n * l * l * (d + c)
    return dt * 1e3, flops / dt / 1e12


def bench_modulated_conv(n=8, h=64, w=64, cin=512, cout=512, dtype=jnp.bfloat16):
    from face_mask_inpaint_tpu.models.stylegan2 import ModulatedConv2d

    mod = ModulatedConv2d(cout, 3, dtype=dtype)
    x = jnp.ones((n, h, w, cin), dtype)
    s = jnp.ones((n, 512), dtype)
    vs = mod.init(jax.random.PRNGKey(0), x, s)
    f = jax.jit(lambda x, s: mod.apply(vs, x, s))
    dt = _timeit(f, x, s, iters=10)
    flops = 2 * n * h * w * cin * cout * 9
    return dt * 1e3, flops / dt / 1e12


def bench_resize(n=8, h=864, w=704, c=3, out=256, dtype=jnp.float32):
    from face_mask_inpaint_tpu.ops.resize import adaptive_avg_pool2d

    x = jnp.ones((n, h, w, c), dtype)
    f = jax.jit(lambda x: adaptive_avg_pool2d(x, (out, out)))
    dt = _timeit(f, x)
    return dt * 1e3, x.size * x.dtype.itemsize / dt / 1e9


def main():
    print("devices:", jax.devices())
    for name, (ms, gbps) in bench_upfirdn().items():
        print(f"upfirdn2d/{name:6s}: {ms:7.3f} ms  {gbps:7.1f} GB/s")
    ms, gbps = bench_fused_act()
    print(f"fused_leaky_relu : {ms:7.3f} ms  {gbps:7.1f} GB/s")
    ms, tflops = bench_attention()
    print(f"blockwise_attn   : {ms:7.3f} ms  {tflops:7.2f} TFLOP/s (L=16384)")
    ms, tflops = bench_modulated_conv()
    print(f"modulated_conv   : {ms:7.3f} ms  {tflops:7.2f} TFLOP/s")
    ms, gbps = bench_resize()
    print(f"adaptive_pool    : {ms:7.3f} ms  {gbps:7.1f} GB/s")


if __name__ == "__main__":
    main()
