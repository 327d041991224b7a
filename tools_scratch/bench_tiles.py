"""Tile-height sweep for the packed stencil kernels at flagship shapes."""

import time
import numpy as np
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.ops.pallas.packed_convt import (
    packed_convt_pair, packed_conv3x3_stats)


def t(fn, *args):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        return None, f"{type(e).__name__}: {str(e)[:90]}"
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 10 * 1e3, None


rs = np.random.RandomState(0)
n, hp = 16, 256

# stage4 conv1: r=2, 64->32, with prologue + stats
x4 = jnp.asarray(rs.randn(n, hp, hp, 4 * 64), jnp.bfloat16)
w1 = jnp.asarray(rs.randn(3, 3, 64, 32) * 0.1, jnp.bfloat16)
b1 = jnp.asarray(rs.randn(32), jnp.bfloat16)
A = jnp.asarray(rs.rand(n, 64) + 0.5, jnp.float32)
B = jnp.asarray(rs.randn(n, 64), jnp.float32)
for th in (4, 8, 16, 32):
    f = jax.jit(lambda a, _th=th: packed_conv3x3_stats(
        a, w1, b1, 2, prologue=(A, B, "LeakyReLU"), with_stats=True, th=_th))
    ms, err = t(f, x4)
    print(f"conv3 stage4 th={th}: {ms if ms is None else round(ms,2)} {err or ''}")

# stage4 convT pair: r=2, (64 w/pro + 32) -> 32
h4 = jnp.asarray(rs.randn(n, hp, hp, 4 * 32), jnp.bfloat16)
wx = jnp.asarray(rs.randn(3, 3, 64, 32) * 0.1, jnp.bfloat16)
wh = jnp.asarray(rs.randn(3, 3, 32, 32) * 0.1, jnp.bfloat16)
bx = jnp.asarray(rs.randn(32), jnp.bfloat16)
Ah = jnp.asarray(rs.rand(n, 32) + 0.5, jnp.float32)
Bh = jnp.asarray(rs.randn(n, 32), jnp.float32)
for th in (4, 8, 16):
    f = jax.jit(lambda a, b, _th=th: packed_convt_pair(
        [(b, wh, bx, (Ah, Bh, "LeakyReLU")), (a, wx, bx)], 2,
        act="LeakyReLU", th=_th))
    ms, err = t(f, x4, h4)
    print(f"convT stage4 th={th}: {ms if ms is None else round(ms,2)} {err or ''}")

# stage3 convT pair: r=1, (64 w/pro... h=64ch, x=128ch) -> 64, with stats
x3 = jnp.asarray(rs.randn(n, hp, hp, 128), jnp.bfloat16)
h3 = jnp.asarray(rs.randn(n, hp, hp, 64), jnp.bfloat16)
wx3 = jnp.asarray(rs.randn(3, 3, 128, 64) * 0.1, jnp.bfloat16)
wh3 = jnp.asarray(rs.randn(3, 3, 64, 64) * 0.1, jnp.bfloat16)
b3 = jnp.asarray(rs.randn(64), jnp.bfloat16)
A3 = jnp.asarray(rs.rand(n, 64) + 0.5, jnp.float32)
B3 = jnp.asarray(rs.randn(n, 64), jnp.float32)
for th in (4, 8, 16):
    f = jax.jit(lambda a, b, _th=th: packed_convt_pair(
        [(b, wh3, b3, (A3, B3, "LeakyReLU")), (a, wx3, b3)], 1,
        with_stats=True, th=_th))
    ms, err = t(f, x3, h3)
    print(f"convT stage3 th={th}: {ms if ms is None else round(ms,2)} {err or ''}")

# stage3 conv1: r=1, 128->64 plain
for th in (8, 16, 32):
    f = jax.jit(lambda a, _th=th: packed_conv3x3_stats(
        a, wx3, b3, 1, prologue=(jnp.ones((n,128),jnp.float32),
                                 jnp.zeros((n,128),jnp.float32), "LeakyReLU"),
        with_stats=True, th=_th))
    ms, err = t(f, x3)
    print(f"conv3 stage3 th={th}: {ms if ms is None else round(ms,2)} {err or ''}")
