"""Pallas TPU kernels: the space-to-depth packed decoder tail at true FLOPs.

The packed decoder (ops/packed.py) executes ConvTranspose2d(k=3,s=2,p=1,op=1)
as a dense [2, 2, r²ci, (2r)²co] conv and the stride-1 3×3 convs as dense
[3, 3, r²ci, r²co] convs. Those dense kernels are mostly zeros: the MXU pays
1.78·r² (convT) / r² (conv) more FLOPs than the math requires — 7.1x at the
flagship's 512²→1024² stage.

These kernels compute the same ops at (near-)true FLOPs with the "slot-row
scheme": per output slot-row, all contributions collapse into dense
[r·C, ·] column-stencil matmuls (the column axis folds into channels on the
packed grid), and every accumulation is wide and lane-aligned — a first-cut
per-(slot, tap) assembly relayout-thrashed and lost to the dense form.

Measured solo wins on v5e bs16 mean nothing in-graph unless the kernels also
absorb their NEIGHBORHOOD: a Pallas custom-call pins row-major layouts and
breaks XLA's producer fusions, so the surrounding convs/norm passes slow by
more than the kernel saves (flagship 74.0 → 80.4 ms with bare kernels).
Hence each kernel optionally fuses:

- a PROLOGUE per input stream: the instance-norm affine x·A + B (A, B
  [N, r²C] from the previous stage's stats) + activation — replacing the
  standalone normalize pass XLA can no longer fuse into a producer conv;
- a STATS EPILOGUE: per-(sample, original-channel) Σy and Σy² of the raw
  output (pooled over space and packed slots), feeding the NEXT stage's
  instance norm — replacing the stats pass XLA used to fuse into the
  producer;
- the consumer's leading activation (the Output head, base_function.py:378).

Derivation (per axis, transposed conv): out[p] += W[t]·x[(p+1-t)/2] with
p = P·2r + q gives q = 2s + t - 1 at block shift 0, except (s=0, t=0) which
lands on the previous block's q = 2r-1 — read-side, out block P additionally
reads the FIRST row/col of block P+1 (zero past the edge, the same zero-pad
the dense form uses, ops/packed.py:151-162). For the stride-1 conv, out slot
a reads input slots a+t-1 with both-side wraps (block P-1 slot r-1 and block
P+1 slot 0).

Training keeps the dense XLA path (natively differentiable); these kernels
serve the inference graph. Reference ops:
/root/reference/modules/pluralistic_model/base_function.py:308-398.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "packed_convt_pair",
    "packed_conv3x3_stats",
    "packed_output_head",
    "use_packed_convt_kernel",
    "use_packed_output_kernel",
    "instance_affine_from_stats",
]


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def use_packed_convt_kernel(train: bool, r_in: int = 1) -> bool:
    """Kernel policy: DEFAULT OFF — opt in with FMI_PACKED_CONVT=1.

    Measured verdict on v5e bs16 (2026-08): the slot-row stencil kernels are
    ~2x faster than the dense packed convs SOLO (stage-4 pair 6.6 vs
    14.1 ms), but IN-GRAPH the full fused tail (conv1 + convT pairs with
    norm-affine prologues and stats epilogues) still loses to XLA's dense
    path — flagship 76.6 vs 74.0 ms — because (a) the custom-calls pin
    row-major layouts that cost the neighboring convs ~2 ms in relayouts
    (the Output-head conv alone 6.4 → 8.6 ms), and (b) the in-kernel
    concat/prologue/masking VPU passes cost more than the MXU FLOPs saved
    (tile-height sweeps flat, so not grid overhead). XLA's dense forms run
    at ~190 TFLOP/s and its producer-epilogue fusions are free; beating
    that needs kernels that swallow the Output head too. Kept (tested,
    interpret-mode parity in CI) as groundwork."""
    import os

    del r_in
    flag = os.environ.get("FMI_PACKED_CONVT")
    if flag == "1":
        return not train
    return False


def instance_affine_from_stats(s, sq, count, gamma, beta, eps=1e-5):
    """(Σy, Σy², N·count) -> per-(sample, channel) A, B with
    normalize(y) = y·A + B (InstanceNorm2d semantics, f32 stats)."""
    mean = s / count
    var = jnp.maximum(sq / count - jnp.square(mean), 0.0)
    a = jax.lax.rsqrt(var + eps)
    if gamma is not None:
        a = a * gamma.astype(jnp.float32)[None]
    b = -mean * a
    if beta is not None:
        b = b + beta.astype(jnp.float32)[None]
    return a, b


def _act(y, act):
    if act == "LeakyReLU":
        return jnp.where(y >= 0, y, y * 0.1)
    if act == "ReLU":
        return jnp.maximum(y, 0.0)
    if act is None or act == "none":
        return y
    raise NotImplementedError(act)


def _load_stream(xc_ref, xn_ref, pro, i, n_tiles, th, wp):
    """Concat the current row-tile with its one-row bottom halo, apply the
    optional normalize+act prologue, THEN zero the halo past the image edge
    and the width pad — the conv's zero padding lives in the POST-norm
    domain (torch normalizes, then the conv pads)."""
    x = jnp.concatenate([xc_ref[0], xn_ref[0]], axis=0)  # [th+1, wp, S*C]
    if pro is not None:
        a_ref, b_ref, pact = pro
        x32 = x.astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0]
        x = _act(x32, pact).astype(x.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 1, 1, 1), 0)
    edge = jnp.logical_or(row < th, i < n_tiles - 1)
    x = jnp.where(edge, x, jnp.zeros_like(x))
    wp_p = wp + 8
    return jnp.concatenate(
        [x, jnp.zeros((th + 1, wp_p - wp, x.shape[-1]), x.dtype)], axis=1
    ), wp_p


def _stats_update(y32, sum_ref, sq_ref, i, th, wp, s_out, co):
    """Accumulate per-original-channel Σ and Σ² of the raw tile output.
    Slot groups reduce via per-slot lane slices — Mosaic cannot shape-cast
    the [s_out·co] lane vector to [s_out, co]."""
    flat = y32.reshape(th * wp, s_out * co)
    row1 = jnp.sum(flat, axis=0, keepdims=True)         # [1, s_out*co]
    row2 = jnp.sum(jnp.square(flat), axis=0, keepdims=True)
    s1 = row1[:, :co]
    s2 = row2[:, :co]
    for q in range(1, s_out):
        s1 = s1 + row1[:, q * co : (q + 1) * co]
        s2 = s2 + row2[:, q * co : (q + 1) * co]

    @pl.when(i == 0)
    def _init():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    sum_ref[0] += s1
    sq_ref[0] += s2


def _pairs_h_convt(qh: int, r: int):
    """Transposed conv, row axis: output slot-row qh of the 2r-packed output
    reads [(input slot-row sa, kernel tap row th_, row-shift δ ∈ {0,1})]."""
    a, odd = divmod(qh, 2)
    pairs = [(a, 1, 0)] if not odd else [(a, 2, 0)]
    if odd:
        pairs.append((a + 1, 0, 0) if a + 1 < r else (0, 0, 1))
    return pairs


def _convt_kernel(*refs, cfg, r, co, th, wp, n_tiles, act, with_stats):
    """cfg: per stream (channels, has_prologue, prologue_act).
    refs: [xc, xn, wrow, wwrap, (A, B)?]*streams, bias, out, (sum, sq)?, acc.
    """
    pos = 0
    loaded = []
    for c, has_pro, pact in cfg:
        xc_ref, xn_ref, wr_ref, ww_ref = refs[pos : pos + 4]
        pos += 4
        pro = None
        if has_pro:
            pro = (refs[pos], refs[pos + 1], pact)
            pos += 2
        loaded.append((c, xc_ref, xn_ref, wr_ref, ww_ref, pro))
    bias_ref = refs[pos]
    o_ref = refs[pos + 1]
    pos += 2
    sum_ref = sq_ref = None
    if with_stats:
        sum_ref, sq_ref = refs[pos], refs[pos + 1]
        pos += 2
    acc = refs[pos]

    i = pl.program_id(1)
    acc[...] = jnp.zeros_like(acc)
    qw_wrap = 2 * r - 1

    for c, xc_ref, xn_ref, wr_ref, ww_ref, pro in loaded:
        rc = r * c
        x, wp_p = _load_stream(xc_ref, xn_ref, pro, i, n_tiles, th, wp)
        for qh in range(2 * r):
            off = qh * 2 * r * co
            for sa, th_, dh in _pairs_h_convt(qh, r):
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
    if with_stats:
        _stats_update(y, sum_ref, sq_ref, i, th, wp, 4 * r * r, co)
    o_ref[0] = _act(y, act).astype(o_ref.dtype)


def _stream_specs(x, th, wp, n_tiles, extra_w_specs):
    """BlockSpecs for (current tile, one-row bottom halo) + weight specs."""
    sc = x.shape[-1]
    specs = [
        pl.BlockSpec((1, th, wp, sc), lambda b_, i_: (b_, i_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, wp, sc),
            lambda b_, i_, _nt=n_tiles, _th=th: (
                b_, jax.lax.min((i_ + 1) * _th, _nt * _th - 1), 0, 0),
            memory_space=pltpu.VMEM),
    ]
    return specs + extra_w_specs


def _pro_operands(prologue, n, sc):
    """Tile per-channel A, B [N, C] to the packed channel dim [N, 1, S·C]
    (the middle singleton keeps the BlockSpec's trailing dims legal)."""
    a, b, pact = prologue
    s = sc // a.shape[-1]
    at = jnp.tile(a.astype(jnp.float32), (1, s))[:, None]
    bt = jnp.tile(b.astype(jnp.float32), (1, s))[:, None]
    spec = pl.BlockSpec((1, 1, sc), lambda b_, i_: (b_, 0, 0),
                        memory_space=pltpu.VMEM)
    return [at, bt], [spec, spec], pact


def packed_convt_pair(
    streams,
    r_in: int,
    act: str | None = None,
    th: int = 4,
    out_dtype=None,
    with_stats: bool = False,
):
    """Sum of ConvTranspose2d(k=3, s=2, p=1, op=1) over input streams.

    streams: list of (x, w, b) or (x, w, b, (A, B, act)) with x
    [N, Hp, Wp, r_in²·C_i] (the r_in-packed view of an [N, H, W, C_i] map on
    a shared block grid), w [3, 3, C_i, Co] (HWIO, as stored by
    nn.layers.ConvTranspose2d), b [Co] or None. The optional (A, B, act)
    prologue applies x·A + B (A, B [N, C_i] f32 — the previous stage's
    instance-norm affine) then `act` before the conv.

    Returns the (2·r_in)-packed output [N, Hp, Wp, 4·r_in²·Co] of
    sum_i convT(x_i', w_i) + b_i with `act` optionally fused; with
    with_stats=True returns (out, (Σy, Σy²)) with the f32 per-(sample,
    channel) sums of the PRE-act output pooled over space and slots.
    """
    assert len(streams) >= 1
    streams = [s if len(s) == 4 else (*s, None) for s in streams]
    n, hp, wp, _ = streams[0][0].shape
    co = streams[0][1].shape[-1]
    r = r_in
    s_out = 4 * r * r
    for x, w, b, _ in streams:
        assert x.shape[:3] == (n, hp, wp)
        assert w.shape[0] == w.shape[1] == 3 and w.shape[-1] == co
        assert x.shape[-1] == r * r * w.shape[2]

    while hp % th:
        th //= 2
    n_tiles = hp // th
    dtype = out_dtype or streams[0][0].dtype

    bias = jnp.zeros((co,), jnp.float32)
    for _, _, b, _ in streams:
        if b is not None:
            bias = bias + b.astype(jnp.float32)
    bias_t = jnp.tile(bias, s_out)[None].astype(jnp.float32)

    operands, in_specs, cfg = [], [], []
    for x, w, _, prologue in streams:
        c = w.shape[2]
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
        wwrap = w[:, 0]  # [3, C, co]: slot-col 2r-1 ← next block's slot-col 0
        sc = x.shape[-1]
        operands += [x, x, wrow.astype(x.dtype), wwrap.astype(x.dtype)]
        in_specs += _stream_specs(x, th, wp, n_tiles, [
            pl.BlockSpec((3, r * c, 2 * r * co), lambda b_, i_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c, co), lambda b_, i_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ])
        pact = None
        if prologue is not None:
            ops_, specs_, pact = _pro_operands(prologue, n, sc)
            operands += ops_
            in_specs += specs_
        cfg.append((c, prologue is not None, pact))
    operands.append(bias_t)
    in_specs.append(pl.BlockSpec((1, s_out * co), lambda b_, i_: (0, 0),
                                 memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((1, th, wp, s_out * co),
                              lambda b_, i_: (b_, i_, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n, hp, wp, s_out * co), dtype)]
    if with_stats:
        stat_spec = pl.BlockSpec((1, 1, co), lambda b_, i_: (b_, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs += [stat_spec, stat_spec]
        out_shape += [jax.ShapeDtypeStruct((n, 1, co), jnp.float32)] * 2

    res = pl.pallas_call(
        functools.partial(
            _convt_kernel, cfg=tuple(cfg), r=r, co=co, th=th, wp=wp,
            n_tiles=n_tiles, act=act, with_stats=with_stats),
        grid=(n, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shape if with_stats else out_shape[0],
        scratch_shapes=[pltpu.VMEM((th, wp, s_out * co), jnp.float32)],
        interpret=_interpret(),
    )(*operands)
    if with_stats:
        return res[0], (res[1][:, 0], res[2][:, 0])
    return res


def _pairs_h_conv(a: int, r: int):
    """Stride-1 3×3 'same' conv, row axis: output slot-row a reads
    [(input slot-row sa, tap row th_, row-shift δ ∈ {-1, 0, 1})]."""
    pairs = []
    for th_ in range(3):
        sa = a + th_ - 1
        if sa == -1:
            pairs.append((r - 1, th_, -1))
        elif sa == r:
            pairs.append((0, th_, 1))
        else:
            pairs.append((sa, th_, 0))
    return pairs


def _conv3_kernel(*refs, c, r, co, th, wp, n_tiles, act, with_stats,
                  has_pro, pact):
    """refs: xp, xc, xn, wrow, wl, wr, (A, B)?, bias, out, (sum, sq)?, acc.

    xp/xn: one-row top/bottom halos (masked to the conv zero-pad at the
    image edges); wrow [3, r·C, r·Co] the per-tap-row column stencil; wl/wr
    [3, C, Co] the left/right column wraps (out col 0 ← prev block slot-col
    r-1 at tw=0; out col r-1 ← next block slot-col 0 at tw=2).
    """
    xp_ref, xc_ref, xn_ref, wr_ref, wl_ref, wrr_ref = refs[:6]
    pos = 6
    pro = None
    if has_pro:
        pro = (refs[pos], refs[pos + 1], pact)
        pos += 2
    bias_ref = refs[pos]
    o_ref = refs[pos + 1]
    pos += 2
    sum_ref = sq_ref = None
    if with_stats:
        sum_ref, sq_ref = refs[pos], refs[pos + 1]
        pos += 2
    acc = refs[pos]

    i = pl.program_id(1)
    acc[...] = jnp.zeros_like(acc)
    rc = r * c

    x = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
    if pro is not None:
        a_ref, b_ref, pa = pro
        x = _act(x.astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0], pa).astype(x.dtype)
    # zero the halos past the image edges AFTER the prologue — the conv's
    # zero padding lives in the post-norm domain
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    edge = jnp.logical_and(
        jnp.logical_or(row > 0, i > 0),
        jnp.logical_or(row < th + 1, i < n_tiles - 1))
    x = jnp.where(edge, x, jnp.zeros_like(x))
    wp_p = wp + 8
    # physical col j of the padded tile holds logical col j-1 so the left
    # wrap (slot-col r-1 of the PREVIOUS block col) is a plain slice
    x = jnp.concatenate(
        [jnp.zeros((th + 2, 1, x.shape[-1]), x.dtype), x,
         jnp.zeros((th + 2, wp_p - wp - 1, x.shape[-1]), x.dtype)], axis=1)

    for a in range(r):
        off = a * r * co
        for sa, th_, dh in _pairs_h_conv(a, r):
            rows = slice(dh + 1, dh + 1 + th)  # x rows are offset by the halo
            xs = x[rows, 1 : wp + 1, sa * rc : (sa + 1) * rc]
            y = jax.lax.dot_general(
                xs.reshape(th * wp, rc), wr_ref[th_],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(th, wp, r * co)
            acc[:, :, off : off + r * co] += y
            # left wrap: out slot-col 0 ← prev block col, slot-col r-1
            xl = x[rows, 0:wp, (sa * r + r - 1) * c : (sa * r + r) * c]
            yl = jax.lax.dot_general(
                xl.reshape(th * wp, c), wl_ref[th_],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(th, wp, co)
            acc[:, :, off : off + co] += yl
            # right wrap: out slot-col r-1 ← next block col, slot-col 0
            xr = x[rows, 2 : wp + 2, sa * rc : sa * rc + c]
            yr = jax.lax.dot_general(
                xr.reshape(th * wp, c), wrr_ref[th_],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(th, wp, co)
            acc[:, :, off + (r - 1) * co : off + r * co] += yr

    y = acc[...] + bias_ref[0].astype(jnp.float32)
    if with_stats:
        _stats_update(y, sum_ref, sq_ref, i, th, wp, r * r, co)
    o_ref[0] = _act(y, act).astype(o_ref.dtype)


def packed_conv3x3_stats(
    x, w, b, r: int,
    prologue=None,
    act: str | None = None,
    with_stats: bool = False,
    th: int = 4,
    out_dtype=None,
):
    """Stride-1 'same' 3×3 conv on an r-packed map, at true FLOPs.

    x: [N, Hp, Wp, r²·C]; w: [3, 3, C, Co]; b: [Co] or None;
    prologue: optional (A, B, act) with A, B [N, C] f32 — the input's
    instance-norm affine + activation fused into the load path.
    Returns the r-packed conv output (optionally with the (Σy, Σy²) stats
    of the pre-act output for the next stage's norm).
    """
    n, hp, wp, sc = x.shape
    c, co = w.shape[2], w.shape[3]
    assert w.shape[:2] == (3, 3) and sc == r * r * c
    while hp % th:
        th //= 2
    n_tiles = hp // th
    dtype = out_dtype or x.dtype

    # wrow[th_, (sb, c), (qb, co)] = Σ_{tw: sb = qb+tw-1} w[th_, tw, c, co]
    wrow = jnp.zeros((3, r * c, r * co), w.dtype)
    for qb in range(r):
        for tw in range(3):
            sb = qb + tw - 1
            if 0 <= sb < r:
                wrow = wrow.at[
                    :, sb * c : (sb + 1) * c, qb * co : (qb + 1) * co
                ].add(w[:, tw])
    wl = w[:, 0]  # out col 0 ← prev block col slot r-1
    wr_ = w[:, 2]  # out col r-1 ← next block col slot 0

    bias = (b.astype(jnp.float32) if b is not None
            else jnp.zeros((co,), jnp.float32))
    bias_t = jnp.tile(bias, r * r)[None]

    operands = [x, x, x, wrow.astype(x.dtype), wl.astype(x.dtype),
                wr_.astype(x.dtype)]
    in_specs = [
        # one-row top halo (clamped at the first row; masked in-kernel)
        pl.BlockSpec(
            (1, 1, wp, sc),
            lambda b_, i_, _th=th: (b_, jax.lax.max(i_ * _th - 1, 0), 0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, wp, sc), lambda b_, i_: (b_, i_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, wp, sc),
            lambda b_, i_, _nt=n_tiles, _th=th: (
                b_, jax.lax.min((i_ + 1) * _th, _nt * _th - 1), 0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec((3, r * c, r * co), lambda b_, i_: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c, co), lambda b_, i_: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c, co), lambda b_, i_: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    pact = None
    has_pro = prologue is not None
    if has_pro:
        ops_, specs_, pact = _pro_operands(prologue, n, sc)
        operands += ops_
        in_specs += specs_
    operands.append(bias_t)
    in_specs.append(pl.BlockSpec((1, r * r * co), lambda b_, i_: (0, 0),
                                 memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((1, th, wp, r * r * co),
                              lambda b_, i_: (b_, i_, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n, hp, wp, r * r * co), dtype)]
    if with_stats:
        stat_spec = pl.BlockSpec((1, 1, co), lambda b_, i_: (b_, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs += [stat_spec, stat_spec]
        out_shape += [jax.ShapeDtypeStruct((n, 1, co), jnp.float32)] * 2

    res = pl.pallas_call(
        functools.partial(
            _conv3_kernel, c=c, r=r, co=co, th=th, wp=wp, n_tiles=n_tiles,
            act=act, with_stats=with_stats, has_pro=has_pro, pact=pact),
        grid=(n, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shape if with_stats else out_shape[0],
        scratch_shapes=[pltpu.VMEM((th, wp, r * r * co), jnp.float32)],
        interpret=_interpret(),
    )(*operands)
    if with_stats:
        return res[0], (res[1][:, 0], res[2][:, 0])
    return res


# ---------------------------------------------------------------------------
# Fused packed Output head: act(Σ streams) -> 3x3 conv -> tanh -> block mean
# ---------------------------------------------------------------------------

def use_packed_output_kernel(train: bool) -> bool:
    """Kernel policy: DEFAULT OFF — opt in with FMI_OUTPUT_KERNEL=1.

    Measured verdict on v5e bs16 flagship (round 3, 2026-08): the fused
    Output-head kernel (act(h+s) prologue + dense-packed co=48 conv + tanh +
    slot-pool epilogue) replaces 13.7 ms of XLA work (compare_select 5.8 +
    Output conv 6.4 + tanh/pool 1.5) but measures 15.5 ms ITSELF plus
    6.5 ms of operand relayouts (the convT producers emit {3,0,2,1}; the
    custom call pins row-major {3,2,1,0}) — flagship 72.7 -> 89.0 ms. The
    in-kernel matmuls run at ~30 TF/s: Mosaic materializes each of the 9
    shifted [th*wp, ck] windows before the dot, so the tap loop is
    copy-bound, on top of the N=48 lane waste XLA's form shares. Beating
    the dense tail here needs either layout-matched custom-call operands
    (emit/accept {3,0,2,1}) or a Mosaic matmul that consumes shifted
    windows in place. Kept (interpret-parity tested + on-chip validated)
    as groundwork, like the stencil pair kernels above."""
    import os

    return os.environ.get("FMI_OUTPUT_KERNEL") == "1" and not train


def _output_head_kernel(*refs, n_streams, ck, r, co, th, wp, n_tiles,
                        n_chunks, act):
    """refs: (xp, xc, xn) per stream, wdense [n_chunks, 9, ck, r²co],
    bias [1, r²co], o_pool, o_top, o_bot, o_left, o_right, acc scratch.

    Grid (N, row tiles, channel chunks) — the contraction axis is split so
    each stream block is [*, *, ck] (the full-channel blocks at flagship
    shapes blow the 16M scoped-vmem limit); acc accumulates across the
    chunk dimension and the epilogue fires on the last chunk.

    The conv is the DENSE packed form ([3, 3, r²C, r²co] built from the
    unchanged weight): with co = 3 the true-FLOP slot-row form would run
    3-lane matmuls, while the dense form's r²co = 48 lanes keep the MXU at
    the same ~74 TF/s XLA achieves — the kernel's win is the fusion (no
    act(h+s) round-trip, no separate tanh/pool passes), not the matmul."""
    qco = r * r * co
    w_ref = refs[3 * n_streams]
    bias_ref = refs[3 * n_streams + 1]
    o_pool, o_top, o_bot, o_left, o_right = refs[
        3 * n_streams + 2 : 3 * n_streams + 7]
    acc = refs[-1]
    i = pl.program_id(1)
    kc = pl.program_id(2)

    x = None
    for s in range(n_streams):
        xp_ref, xc_ref, xn_ref = refs[3 * s : 3 * s + 3]
        xi = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
        x = xi if x is None else x + xi  # [th+2, wp, ck]
    if act is not None:
        # stream dtype (bf16) on purpose (the dense path's act(h+s) fusion
        # computes in bf16 too); max-form because Mosaic rejects bf16
        # compares on v5e ("Target does not support this comparison") — for
        # slope < 1 it is EXACT: max(y, s*y) == where(y >= 0, y, s*y).
        if act == "LeakyReLU":
            x = jnp.maximum(x, x * jnp.asarray(0.1, x.dtype))
        elif act == "ReLU":
            x = jnp.maximum(x, jnp.zeros_like(x))
        else:
            raise NotImplementedError(act)
    # zero the row halos past the image edges (top halo block is clamped to
    # row 0 at i==0, bottom to the last row at i==n_tiles-1)
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    edge = jnp.logical_and(
        jnp.logical_or(row > 0, i > 0),
        jnp.logical_or(row < th + 1, i < n_tiles - 1))
    x = jnp.where(edge, x, jnp.zeros_like(x))
    # one zero column each side (the packed conv's 'same' zero pad; physical
    # width padded to a lane-friendly wp + 8)
    x = jnp.concatenate(
        [jnp.zeros((th + 2, 1, ck), x.dtype), x,
         jnp.zeros((th + 2, 7, ck), x.dtype)], axis=1)

    @pl.when(kc == 0)
    def _zero():
        acc[...] = jnp.zeros_like(acc)

    for t in range(9):
        sh, sw = divmod(t, 3)
        xs = x[sh : sh + th, sw : sw + wp]
        acc[...] += jax.lax.dot_general(
            xs.reshape(th * wp, ck), w_ref[0, t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th, wp, qco)

    @pl.when(kc == n_chunks - 1)
    def _epilogue():
        y = acc[...] + bias_ref[0]

        # pre-tanh edge blocks for the reflection-pad ring correction
        @pl.when(i == 0)
        def _top():
            o_top[0] = y[0:1].astype(o_top.dtype)

        @pl.when(i == n_tiles - 1)
        def _bot():
            o_bot[0] = y[th - 1 : th].astype(o_bot.dtype)

        # 3D [tile, qco] writes: 4D (1, th, 1, qco) width-1 out blocks
        # SIGABRT the Mosaic lowering (PrepareOutput) on v5e
        o_left[0] = y[:, 0, :].astype(o_left.dtype)
        o_right[0] = y[:, wp - 1, :].astype(o_right.dtype)

        t_ = jnp.tanh(y)
        # adaptive pool: mean over the r² packed slots (channel (q)*co + c)
        p = t_[:, :, 0:co]
        for q in range(1, r * r):
            p = p + t_[:, :, q * co : (q + 1) * co]
        o_pool[0] = (p * (1.0 / (r * r))).astype(o_pool.dtype)


def packed_output_head(streams, w, b, r: int, act: str | None = None,
                       th: int = 8):
    """One-pass packed Output head (base_function.py:367-398 at pack r with
    the caller's integer-factor pool folded in, modules/model.py:79).

    streams: one [N, Hp, Wp, r²C] map (already activated), or several summed
    in-kernel with ``act`` applied (the decoder's h + bypass pre-add pair —
    saves the full-size act(h+s) materialization XLA cannot fuse into the
    conv). w: [3, 3, C, co] effective conv weight; b: [co] or None.

    Returns (pooled [N, Hp, Wp, co] with zero-pad borders,
    (top, bot [N, Wp, r²co], left, right [N, Hp, r²co]) pre-tanh conv edge
    blocks — the caller rebuilds the reflection-pad ring from those).
    """
    from face_mask_inpaint_tpu.ops.packed import pack_conv3x3_kernel

    n, hp, wp, sc = streams[0].shape
    c, co = w.shape[2], w.shape[3]
    qco = r * r * co
    assert w.shape[:2] == (3, 3) and sc == r * r * c
    while hp % th:
        th //= 2
    n_tiles = hp // th
    dtype = streams[0].dtype

    # contraction split: full-channel stream blocks exceed the 16M scoped
    # vmem at the flagship's [16, 256, 256, 512] bf16 shapes
    ck = sc
    n_chunks = 1
    while ck > 256:
        ck //= 2
        n_chunks *= 2
    wd = pack_conv3x3_kernel(w, r).reshape(9, n_chunks, ck, qco)
    wd = jnp.transpose(wd, (1, 0, 2, 3)).astype(dtype)
    bias = (b.astype(jnp.float32) if b is not None
            else jnp.zeros((co,), jnp.float32))
    bias_t = jnp.tile(bias, r * r)[None]

    operands, in_specs = [], []
    for x in streams:
        operands += [x, x, x]
        in_specs += [
            pl.BlockSpec(
                (1, 1, wp, ck),
                lambda b_, i_, k_, _th=th: (
                    b_, jax.lax.max(i_ * _th - 1, 0), 0, k_),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, ck),
                         lambda b_, i_, k_: (b_, i_, 0, k_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, wp, ck),
                lambda b_, i_, k_, _nt=n_tiles, _th=th: (
                    b_, jax.lax.min((i_ + 1) * _th, _nt * _th - 1), 0, k_),
                memory_space=pltpu.VMEM),
        ]
    operands += [wd, bias_t]
    in_specs += [
        pl.BlockSpec((1, 9, ck, qco), lambda b_, i_, k_: (k_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qco), lambda b_, i_, k_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, th, wp, co), lambda b_, i_, k_: (b_, i_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wp, qco), lambda b_, i_, k_: (b_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wp, qco), lambda b_, i_, k_: (b_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, qco), lambda b_, i_, k_: (b_, i_, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, qco), lambda b_, i_, k_: (b_, i_, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, hp, wp, co), dtype),
        jax.ShapeDtypeStruct((n, 1, wp, qco), jnp.float32),
        jax.ShapeDtypeStruct((n, 1, wp, qco), jnp.float32),
        jax.ShapeDtypeStruct((n, hp, qco), jnp.float32),
        jax.ShapeDtypeStruct((n, hp, qco), jnp.float32),
    ]
    pooled, top, bot, left, right = pl.pallas_call(
        functools.partial(
            _output_head_kernel, n_streams=len(streams), ck=ck, r=r, co=co,
            th=th, wp=wp, n_tiles=n_tiles, n_chunks=n_chunks, act=act),
        grid=(n, n_tiles, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((th, wp, qco), jnp.float32)],
        # the unrolled 9-tap loop's temporaries overflow the default 16M
        # scoped-vmem budget at flagship shapes; v5e has 128M physical
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return pooled, (top[:, 0], bot[:, 0], left, right)
