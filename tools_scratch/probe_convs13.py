"""On-chip probe for the 512²-stage conv_b execution forms (pSp decoder
convs_13). The packed form [16,256,256,256]⊛[3,3,256,256] draws a 108 TF/s
emitter tiling (r4 trace) while the same-FLOP convs_15 shape gets 182, so
the stage now runs dense by default. This probe asks whether a SPLIT packed
kernel (co or cc halves of 128, each matching convs_15's good profile) can
dodge the bad tiling and beat the dense form.

All variants compute the same per-image work (true FLOPs = dense form);
executed FLOPs differ (packed pays 4x). Reported TF/s is on EXECUTED FLOPs
per variant, ms is the comparable quantity.

Usage: python tools_scratch/probe_convs13.py
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

N = 16
K = 3
rs = np.random.RandomState(0)
# dense form: 512² grid, 64 ch
xd = jnp.asarray(rs.randn(N, 512, 512, 64) * 0.1, jnp.bfloat16)
wd = jnp.asarray(rs.randn(K, K, 64, 64) / np.sqrt(K * K * 64), jnp.bfloat16)
# packed form: 256² grid, 256 ch (the r=2 space-to-depth of the above)
xp = jnp.asarray(rs.randn(N, 256, 256, 256) * 0.1, jnp.bfloat16)
wp = jnp.asarray(rs.randn(K, K, 256, 256) / np.sqrt(K * K * 256),
                 jnp.bfloat16)


def timed(name, fn, x, flops, iters=8):
    f = jax.jit(fn)
    y = f(x)
    jax.block_until_ready(y)
    tdir = tempfile.mkdtemp(prefix=f"probe_{name.replace(' ', '_')}_")
    with jax.profiler.trace(tdir):
        xx = x
        for _ in range(iters):
            y = f(xx)
            xx = 0.9 * xx + 0.1 * y
        jax.block_until_ready(xx)
    t = device_op_time_s(tdir) / iters
    print(f"{name:28s} {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s "
          f"(executed)")
    return t


dense_flops = 2 * N * 512 * 512 * K * K * 64 * 64
packed_flops = 2 * N * 256 * 256 * K * K * 256 * 256

timed("dense 512g c64", lambda x: conv2d(x, wd, None, padding=1),
      xd, dense_flops)
timed("packed 256g cc256 co256", lambda x: conv2d(x, wp, None, padding=1),
      xp, packed_flops)
timed("packed split-co 2x128",
      lambda x: jnp.concatenate(
          [conv2d(x, wp[..., :128], None, padding=1),
           conv2d(x, wp[..., 128:], None, padding=1)], axis=-1),
      xp, packed_flops)
timed("packed split-cc 2x128",
      lambda x: (conv2d(x[..., :128], wp[:, :, :128], None, padding=1)
                 + conv2d(x[..., 128:], wp[:, :, 128:], None, padding=1)),
      xp, packed_flops)
timed("packed split-4 co4x64",
      lambda x: jnp.concatenate(
          [conv2d(x, wp[..., i * 64:(i + 1) * 64], None, padding=1)
           for i in range(4)], axis=-1),
      xp, packed_flops)
