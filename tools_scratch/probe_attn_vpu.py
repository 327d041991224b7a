"""Locate the flash-attention forward's binding unit on v5e.

Variants of the rectangular fwd kernel with softmax pieces removed
(semantics intentionally broken for all but 'base') at the flagship shape
N=16, L=16384, d=64, c_total=256 bf16:

  base     — the production kernel's math (online max + exp2 + sum + PV)
  nomax    — no running-max tracking: p = exp2(s - CONST), l += sum(p)
  noexp    — exp2 replaced by a single multiply (p = s * 2^-9)
  mmonly   — score matmul + PV matmul only (p = s cast)
  pvonly   — PV matmul only (skip the score matmul, p = const tile)

If base ≈ nomax ≈ noexp ≫ mmonly, the kernel is NOT VPU-bound and
scheduling is the gap; if base ≫ noexp ≈ mmonly, exp2 is the wall; if
nomax ≪ base, the online-max bookkeeping is the wall.
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, L, D, CT = 16, 16384, 64, 256
TQ = TK = 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, nk, mode):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf if mode == "base" else 0.0)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if mode != "pvonly":
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        s = jnp.full((TQ, TK), 0.001, jnp.float32)

    if mode == "base":
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = m_new
    elif mode == "nomax":
        p = jnp.exp2(s - 64.0)
        l_scr[...] += jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] += jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif mode == "noexp":
        p = s * 0.001953125
        l_scr[...] += jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] += jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:  # mmonly / pvonly
        p = s
        acc_scr[...] += jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finish():
        if mode in ("base", "nomax", "noexp"):
            o_ref[0] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-30)).astype(
                o_ref.dtype)
        else:
            o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def run(mode):
    nq, nk = L // TQ, L // TK
    f = pl.pallas_call(
        functools.partial(_kernel, nk=nk, mode=mode),
        grid=(N, nq, nk),
        in_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, CT), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, CT), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, CT), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, 1), jnp.float32),
            pltpu.VMEM((TQ, CT), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(N, L, D) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(N, L, D) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(N, L, CT), jnp.bfloat16)
    g = jax.jit(f)
    out = g(q, k, v)
    jax.block_until_ready(out)
    # wall-clock through the relay is not fenceable (ROUND3_NOTES): use the
    # profiled device-op-time method, like bench.py's psp config
    import os
    import tempfile

    sys.path.insert(0, "/root/repo")
    from face_mask_inpaint_tpu.tools.trace_top import device_op_time_s

    reps = 5
    tdir = tempfile.mkdtemp(prefix=f"attnprobe_{mode}_")
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            out = g(q, k, v)
        jax.block_until_ready(out)
    dt = device_op_time_s(tdir) / reps * 1e3
    print(f"{mode:8s} {dt:7.2f} ms/call (device op time)")
    return dt


if __name__ == "__main__":
    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "base", "nomax", "noexp", "mmonly", "pvonly"]
    for m in modes:
        run(m)
