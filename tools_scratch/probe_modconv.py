"""On-chip probe: why does the packed 1024²-stage modulated conv (pSp
decoder convs_15, trace fusion.14) run at ~100 TF/s when unmodulated packed
convs reach ~190?

Measures device-op time (trace-derived) of single-op jits at the exact
convs_15 packed shape: x [16,512,512,128] bf16, W [3,3,128,128].
Variants isolate the input-scale fusion, the demod output scale, and the
epilogue (noise add + bias + leaky).

Usage: python tools_scratch/probe_modconv.py
"""
import os
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from face_mask_inpaint_tpu.ops.conv import conv2d
from face_mask_inpaint_tpu.tools.trace_top import device_op_time_s

N, G, CC = 16, 512, 128
K = 3
rs = np.random.RandomState(0)
x0 = jnp.asarray(rs.randn(N, G, G, CC) * 0.1, jnp.bfloat16)
w = jnp.asarray(rs.randn(K, K, CC, CC) * (1.0 / np.sqrt(K * K * CC)),
                jnp.bfloat16)
s = jnp.asarray(rs.rand(N, CC) + 0.5, jnp.float32)       # flat packed scale
d = jnp.asarray(rs.rand(N, CC) + 0.5, jnp.float32)       # flat demod scale
noise = jnp.asarray(rs.randn(N, G, G, CC) * 0.01, jnp.bfloat16)

conv_flops = 2 * N * G * G * K * K * CC * CC


def timed(name, fn, *args, iters=8):
    f = jax.jit(fn)
    y = f(*args)
    jax.block_until_ready(y)
    # chain x through to defeat relay memoization where output shape allows
    tdir = tempfile.mkdtemp(prefix=f"probe_{name}_")
    with jax.profiler.trace(tdir):
        xx = args[0]
        for _ in range(iters):
            y = f(xx, *args[1:])
            xx = 0.9 * xx + 0.1 * y
        jax.block_until_ready(xx)
    t = device_op_time_s(tdir) / iters
    # subtract the chain-mix op cost? report raw; mix is ~bandwidth-only
    print(f"{name:28s} {t * 1e3:7.3f} ms  {conv_flops / t / 1e12:6.1f} TF/s")
    return t


def plain(x):
    return conv2d(x, w, None, padding=K // 2)


def in_scaled(x):
    xs = x * jnp.tile(s, (1, 1))[:, None, None, :].astype(x.dtype)
    return conv2d(xs, w, None, padding=K // 2)


def in_scaled_barrier(x):
    xs = x * s[:, None, None, :].astype(x.dtype)
    xs = jax.lax.optimization_barrier(xs)
    return conv2d(xs, w, None, padding=K // 2)


def out_scaled(x):
    return conv2d(x, w, None, padding=K // 2) * d[:, None, None, :].astype(x.dtype)


def full_modconv(x):
    xs = x * s[:, None, None, :].astype(x.dtype)
    y = conv2d(xs, w, None, padding=K // 2)
    return y * d[:, None, None, :].astype(x.dtype)


def full_epilogue(x):
    """modconv + noise add + leaky (the actual convs_15 fusion contents)."""
    xs = x * s[:, None, None, :].astype(x.dtype)
    y = conv2d(xs, w, None, padding=K // 2)
    y = y * d[:, None, None, :].astype(x.dtype)
    y = y + noise
    return jax.nn.leaky_relu(y, 0.2) * np.sqrt(2.0)


def weight_mod(x):
    """Weight-side modulation: per-sample weight via feature-group trick is
    NOT used; instead scale folded into W per batch -> batched conv via
    einsum-style grouped conv. For bs16 this inflates weight traffic 16x;
    measured for completeness."""
    wm = w[None] * s[:, None, None, :, None].astype(w.dtype)  # [N,3,3,CC,CC]
    xg = x.reshape(1, N * G, G, CC)
    # grouped conv needs channel grouping, not batch; emulate with scan
    def body(c, nw):
        xi, wi = nw
        return c, conv2d(xi[None], wi, None, padding=K // 2)[0]
    _, y = jax.lax.scan(body, 0, (x, wm))
    return y


if __name__ == "__main__":
    print(f"shape x={x0.shape} w={w.shape}  conv TFLOP={conv_flops/1e12:.3f}")
    timed("plain", plain, x0)
    timed("in_scaled", in_scaled, x0)
    timed("in_scaled_barrier", in_scaled_barrier, x0)
    timed("out_scaled", out_scaled, x0)
    timed("full_modconv", full_modconv, x0)
    timed("full_epilogue", full_epilogue, x0)
