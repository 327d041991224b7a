"""Solo-bench flash-attention BACKWARD at the train shape (bs8, bf16/f32)."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

N, L, D, C = 8, 16384, 64, 128
dt = jnp.bfloat16 if os.environ.get("DT", "bf16") == "bf16" else jnp.float32
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(N, L, D) * 0.3, dt)
v1 = jnp.asarray(rs.randn(N, L, C), dt)
v2 = jnp.asarray(rs.randn(N, L, C), dt)


def run(tag, iters=6):
    def loss(a, b, c, s):
        outs = flash_attention(jnp.roll(a, s, axis=1), [b, c])
        return sum(o.astype(jnp.float32).sum() for o in outs)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    r = g(q, v1, v2, 0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r = g(q, v1, v2, i + 1)
        jax.block_until_ready(r)
    dt_ = (time.perf_counter() - t0) / iters
    print(f"{tag:40s} {dt_*1e3:8.2f} ms", flush=True)


for bwd_tq in (512, 1024, 256):
    os.environ["FMI_FLASH_BWD_TQ"] = str(bwd_tq)
    try:
        run(f"fwd+bwd dt={dt.__name__} bwd_tq={bwd_tq}")
    except Exception as e:
        print(f"bwd_tq={bwd_tq} FAIL {type(e).__name__}: {str(e)[:150]}")
