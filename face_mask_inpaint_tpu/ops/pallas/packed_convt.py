"""Pallas TPU kernel: true-FLOP transposed conv on the packed decoder tail.

The space-to-depth packed decoder (ops/packed.py) executes
ConvTranspose2d(k=3, s=2, p=1, op=1) as a dense [2, 2, r²ci, (2r)²co] conv.
That dense kernel is mostly zeros — each output slot really reads only
2.25 taps on average — so the MXU does 1.78·r² more FLOPs than the math
requires (7.1x at the flagship's 512²→1024² stage, measured 8.7 ms/step of
the 76 ms bs16 step even at ~190 TFLOP/s).

This kernel computes the same op at its TRUE FLOP count: per packed slot it
runs one [px, C] @ [C, 9·Co] tap-matmul (weights shared across slots) and
assembles the 2r-packed output with static shifted adds in VMEM — the
(slot, tap) → (out-slot, block-shift) map is a bijection, so every computed
tap value is used exactly once.  It fuses the ResBlockDecoder convT *pair*
(base_function.py:308-364: the conv branch and the transposed-conv bypass
share one output sum), the biases, and optionally the following LeakyReLU,
so the full-resolution intermediate is written exactly once.

Derivation (per axis, output offset q of a 2r-packed block, input slot s,
tap t of the k=3/s=2/p=1/op=1 transposed conv):  out[p] += W[t]·x[(p+1-t)/2]
with p = P·2r + q gives q = 2s + t - 1 at block shift 0, except (s=0, t=0)
which lands on the previous block's q = 2r-1 — i.e. read-side, out block P
additionally reads the FIRST row/col of block P+1 (zero past the edge, the
same zero-pad the dense form uses, ops/packed.py:151-162).

Training keeps the dense XLA path (it is natively differentiable); this
kernel is used for the inference graph. Reference op:
/root/reference/modules/pluralistic_model/base_function.py:308-364.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["packed_convt_pair", "use_packed_convt_kernel"]


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def use_packed_convt_kernel(train: bool, r_in: int = 1) -> bool:
    """Kernel policy: inference graphs on real TPU backends (the dense XLA
    path is natively differentiable, so training keeps it), or anywhere when
    FMI_PACKED_CONVT=1 (interpret-mode CI parity tests). FMI_PACKED_CONVT=0
    force-disables.

    Default OFF pending an end-to-end win: in-graph, the Pallas custom-call
    pins row-major layouts on its operands/results, and the surrounding XLA
    convs (which prefer C-minor interleaved layouts) each slow by ~0.5-1 ms
    absorbing them — the r01-style stage-3 kernel measured faster solo
    (5.9 vs 7.0 ms) yet REGRESSED the full flagship step 76.7 → 83.2 ms.
    del r_in — kept for call-site clarity until the gate goes shape-aware."""
    import os

    del r_in
    flag = os.environ.get("FMI_PACKED_CONVT")
    if flag == "0":
        return False
    if flag == "1":
        return not train
    return False


def _pairs_h(qh: int, r: int):
    """Row-axis contributions to output slot-row qh of the 2r-packed output:
    [(input slot-row sa, kernel tap row th_, read row-shift δ ∈ {0,1})].
    From out[p] += W[t]·x[(p+1-t)/2] with p = P·2r + qh: even qh = 2a reads
    (a, t=1) in-block; odd qh = 2a+1 reads (a, t=2) and (a+1, t=0), the
    latter wrapping to slot-row 0 of block P+1 when a+1 == r."""
    a, odd = divmod(qh, 2)
    pairs = [(a, 1, 0)] if not odd else [(a, 2, 0)]
    if odd:
        pairs.append((a + 1, 0, 0) if a + 1 < r else (0, 0, 1))
    return pairs


def _kernel(*refs, streams, r, co, th, wp, n_tiles, act):
    """refs: [xc, xn, wrow, wwrap]*len(streams), bias, out, acc_scr.

    xc: [1, th, wp, r²·C] current row-tile of the r-packed input; xn:
    [1, 1, wp, r²·C] halo row (first row of the next tile; clamped garbage
    on the last tile — masked to the transposed conv's zero pad);
    wrow: [3, r·C, 2r·co] — per kernel-tap-row th_, the dense 1D column
    stencil Wrow[th_][(sb, c), (qw, co)] = Σ_{tw: 2sb+tw-1=qw} w[th_, tw];
    wwrap: [3, C, co] = w[:, 0] — the column-wrap tap (output slot-col 2r-1
    reading slot-col 0 of the next block column);
    bias: [1, 4r²·co]; out: [1, th, wp, 4r²·co].

    All main accumulations are [2r·co]-sized and 2r·co-aligned on the lane
    axis (the whole point: the per-(slot, tap) assembly variant relayouts
    36 offset slices and loses to the dense form).
    """
    n_streams = len(streams)
    ins = refs[: 4 * n_streams]
    bias_ref = refs[4 * n_streams]
    o_ref = refs[4 * n_streams + 1]
    acc = refs[4 * n_streams + 2]

    i = pl.program_id(1)
    acc[...] = jnp.zeros_like(acc)
    wp_p = wp + 8  # sublane-aligned width incl. the +1 column halo
    qw_wrap = 2 * r - 1

    for si in range(n_streams):
        c = streams[si]
        rc = r * c
        xc_ref, xn_ref, wr_ref, ww_ref = ins[4 * si : 4 * si + 4]
        halo = xn_ref[0]  # [1, wp, r²·C]
        halo = jnp.where(i < n_tiles - 1, halo, jnp.zeros_like(halo))
        x = jnp.concatenate([xc_ref[0], halo], axis=0)  # [th+1, wp, r²C]
        x = jnp.concatenate(
            [x, jnp.zeros((th + 1, wp_p - wp, x.shape[-1]), x.dtype)], axis=1)

        for qh in range(2 * r):
            off = qh * 2 * r * co
            for sa, th_, dh in _pairs_h(qh, r):
                xs = x[dh : dh + th, :, sa * rc : (sa + 1) * rc]
                y = jax.lax.dot_general(
                    xs.reshape(th * wp_p, rc), wr_ref[th_],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(th, wp_p, 2 * r * co)
                acc[:, :, off : off + 2 * r * co] += y[:, :wp]
                # column wrap: slot-col 0 of the next block column
                xw = x[dh : dh + th, 1 : wp + 1, sa * rc : sa * rc + c]
                yw = jax.lax.dot_general(
                    xw.reshape(th * wp, c), ww_ref[th_],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(th, wp, co)
                acc[:, :, off + qw_wrap * co : off + (qw_wrap + 1) * co] += yw

    y = acc[...] + bias_ref[0].astype(jnp.float32)
    if act == "LeakyReLU":
        y = jnp.where(y >= 0, y, y * 0.1)
    elif act == "ReLU":
        y = jnp.maximum(y, 0.0)
    elif act is not None:
        raise NotImplementedError(act)
    o_ref[0] = y.astype(o_ref.dtype)


def packed_convt_pair(
    streams,
    r_in: int,
    act: str | None = None,
    th: int = 4,
    out_dtype=None,
):
    """Sum of ConvTranspose2d(k=3, s=2, p=1, op=1) over input streams.

    streams: list of (x, w, b) with x [N, Hp, Wp, r_in²·C_i] (the r_in-packed
    view of an [N, H, W, C_i] map on a shared block grid), w [3, 3, C_i, Co]
    (HWIO, as stored by nn.layers.ConvTranspose2d), b [Co] or None.
    Returns the (2·r_in)-packed output [N, Hp, Wp, 4·r_in²·Co] of
    sum_i convT(x_i, w_i) + b_i, with `act` (LeakyReLU 0.1) optionally fused.
    """
    assert len(streams) >= 1
    n, hp, wp, _ = streams[0][0].shape
    co = streams[0][1].shape[-1]
    r = r_in
    s_out = 4 * r * r
    for x, w, b in streams:
        assert x.shape[:3] == (n, hp, wp)
        assert w.shape[0] == w.shape[1] == 3 and w.shape[-1] == co
        assert x.shape[-1] == r * r * w.shape[2]

    while hp % th:
        th //= 2
    n_tiles = hp // th
    dtype = out_dtype or streams[0][0].dtype

    bias = jnp.zeros((co,), jnp.float32)
    for _, _, b in streams:
        if b is not None:
            bias = bias + b.astype(jnp.float32)
    bias_t = jnp.tile(bias, s_out)[None].astype(jnp.float32)

    operands = []
    in_specs = []
    chans = []
    for x, w, _ in streams:
        c = w.shape[2]
        chans.append(c)
        # Per tap-row dense 1D column stencil:
        # wrow[th_, (sb, c), (qw, co)] = Σ_{tw: 2sb+tw-1 = qw} w[th_, tw, c, co]
        wrow = jnp.zeros((3, r * c, 2 * r * co), w.dtype)
        for sb in range(r):
            for tw in range(3):
                qw = 2 * sb + tw - 1
                if 0 <= qw < 2 * r:
                    wrow = wrow.at[
                        :, sb * c : (sb + 1) * c, qw * co : (qw + 1) * co
                    ].add(w[:, tw])
        # column-wrap tap: output slot-col 2r-1 ← slot-col 0 of next block
        wwrap = w[:, 0]  # [3, C, co]
        sc = x.shape[-1]
        operands += [x, x, wrow.astype(x.dtype), wwrap.astype(x.dtype)]
        in_specs += [
            pl.BlockSpec((1, th, wp, sc), lambda b_, i_: (b_, i_, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo: the single row just below this tile (clamped at the end)
            pl.BlockSpec(
                (1, 1, wp, sc),
                lambda b_, i_, _nt=n_tiles, _th=th: (
                    b_, jax.lax.min((i_ + 1) * _th, _nt * _th - 1), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r * c, 2 * r * co), lambda b_, i_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, co), lambda b_, i_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    operands.append(bias_t)
    in_specs.append(pl.BlockSpec((1, s_out * co), lambda b_, i_: (0, 0),
                                 memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(
            _kernel, streams=tuple(chans), r=r, co=co, th=th, wp=wp,
            n_tiles=n_tiles, act=act),
        grid=(n, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, wp, s_out * co),
                               lambda b_, i_: (b_, i_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, s_out * co), dtype),
        scratch_shapes=[pltpu.VMEM((th, wp, s_out * co), jnp.float32)],
        interpret=_interpret(),
    )(*operands)
    return out
