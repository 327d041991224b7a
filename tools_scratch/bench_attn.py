"""Solo-bench flash-attention variants at the flagship shape.

Shape: N=16, L=16384, d=64, two value streams of 128 ch (C_total=256).
Baseline in-graph cost ~21.5 ms/step (trace r3).
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N, L, D, C = 16, 16384, 64, 128

rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(N, L, D) * 0.3, jnp.bfloat16)
v1 = jnp.asarray(rs.randn(N, L, C), jnp.bfloat16)
v2 = jnp.asarray(rs.randn(N, L, C), jnp.bfloat16)


def run(tag, f, iters=8):
    """block_until_ready through the relay does not fence reliably — fetch a
    scalar of each call's output to host (tiny transfer) per iteration, and
    vary inputs per call via a rolled q so the relay cannot value-memoize."""
    try:
        g = jax.jit(lambda a, b, c, s: sum(
            o.astype(jnp.float32).sum()
            for o in f(jnp.roll(a, s, axis=1), b, c)))
        float(g(q, v1, v2, 0))
        t0 = time.perf_counter()
        for i in range(iters):
            float(g(q, v1, v2, i + 1))
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag:40s} {dt*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{tag:40s} FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

for tq, tk in ((512, 1024), (512, 1024), (256, 1024), (512, 2048),
               (1024, 1024), (256, 2048), (512, 512), (1024, 512)):
    f = (lambda tq=tq, tk=tk: lambda a, b, c: flash_attention(
        a, [b, c], tq=tq, tk=tk))()
    run(f"baseline tq={tq} tk={tk}", f)

from attn_variants import forward_v2

run("null (overhead probe)", lambda a, b, c: [a[:, :8, :].sum()[None]])
for tq, tk, bf16_p in ((512, 1024, False), (1024, 1024, False),
                       (512, 2048, False), (1024, 2048, False),
                       (512, 1024, True), (1024, 1024, True)):
    f = (lambda tq=tq, tk=tk, bp=bf16_p: lambda a, b, c: forward_v2(
        a, [b, c], tq=tq, tk=tk, bf16_p=bp))()
    run(f"v2 tq={tq} tk={tk} bf16_p={int(bf16_p)}", f)

# numeric check of v2/v3 vs baseline at the real shape
o_base = jax.jit(lambda a, b, c: flash_attention(a, [b, c]))(q, v1, v2)
o_v2 = jax.jit(lambda a, b, c: forward_v2(a, [b, c]))(q, v1, v2)
o_v3 = jax.jit(lambda a, b, c: forward_v2(a, [b, c], bf16_p=True))(q, v1, v2)
for tag, o in (("v2", o_v2), ("v3", o_v3)):
    md = max(float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
             for x, y in zip(o, o_base))
    rng = float(jnp.max(jnp.abs(o_base[0].astype(jnp.float32))))
    print(f"{tag}: maxdiff={md:.5f} (out range ~{rng:.3f})", flush=True)
