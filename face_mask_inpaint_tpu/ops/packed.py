"""Space-to-depth ("packed") execution of high-resolution small-channel maps.

The PICNet decoder tail (reference network.py:247-273 at the flagship config)
upsamples to 512² and 1024² maps with 64/32/3 channels before an adaptive
avg-pool back to 256² (modules/model.py:79). On TPU those stages are
catastrophically layout-bound: lane-padding C=32→128 wastes 4x of every
elementwise pass and the MXU tiles of the convs (measured 7-26 TFLOP/s and
170-240 GB/s on v5e — see ROUND1_NOTES/ROUND2_NOTES).

These ops execute the same math on a space-to-depth representation: an
[N, H, W, C] map becomes [N, H/r, W/r, r*r*C] with packed channel index
(a*r + b)*C + c for the pixel at block offset (a, b). Channels become
MXU/lane friendly (256-512 wide), 1024² tensors are never materialized, and
the final integer-factor adaptive pool folds into a channel-group mean.

Weight layouts are unchanged — packed kernels are built on the fly from the
exact conv/convT weights, so parameter pytrees, checkpoints and converters
are untouched; packing is purely an execution strategy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from face_mask_inpaint_tpu.ops.conv import conv2d

__all__ = [
    "use_half_tail",
    "space_to_depth",
    "depth_to_space",
    "pack_conv3x3_kernel",
    "pack_conv_transpose2x_kernel",
    "pack_conv3x3_half_kernel",
    "packed_conv3x3",
    "packed_conv_transpose2x",
    "packed_conv3x3_half_in",
    "conv1x1_w_grouped",
    "packed_instance_norm_act",
    "packed_block_mean",
    "packed_leaky_relu",
]


def use_half_tail() -> bool:
    """Gate for the r-capped ("half") decoder-tail emission: the LAST
    decoder block unpacks its operands and runs the convTs at r_in=1 so the
    output lands 2-packed on the doubled grid instead of (2r)-packed, and
    the Output head consumes that form via packed_conv3x3_half_in. Executed
    convT FLOPs stop scaling with r² (flagship decoder4: 549+1097 GF ->
    137+275 GF; Output conv 461 -> 206 GF) at the cost of one extra
    depth_to_space per operand. MEASURED VERDICT (v5e, flagship bs16):
    LOSES — 202.6 vs 220.4 imgs/s. XLA runs the r²-inflated dense packed
    convs at ~190 TFLOP/s with free epilogue fusions; the half form's
    full-res unpack materializations + the stride-2 half-grid conv cost
    more than the MXU FLOPs saved (same story as the Pallas stencil
    kernels, see ops/pallas/packed_convt.py). Kept opt-in
    (FMI_HALF_TAIL=1), exactness pinned by tests/test_packed_ops.py."""
    import os

    return os.environ.get("FMI_HALF_TAIL", "0") == "1"


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """[N, H, W, C] -> [N, H/r, W/r, r*r*C], packed index (a*r+b)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // r, w // r, r * r * c)


@functools.lru_cache(maxsize=None)
def _d2s_kernel_np(r: int, c: int) -> np.ndarray:
    """Selection kernel expressing depth_to_space as a transposed conv:
    out[rg+a, rw+b, ch] = x[g, w, (a*r+b)*c + ch] via lhs_dilation=r,
    pad (r-1, r-1), kernel tap [r-1-a, r-1-b]."""
    k = np.zeros((r, r, r * r * c, c), np.float32)
    for a in range(r):
        for b in range(r):
            for ch in range(c):
                k[r - 1 - a, r - 1 - b, (a * r + b) * c + ch, ch] = 1.0
    return k


@functools.lru_cache(maxsize=None)
def _d2s_row_kernel_np(r: int, c: int) -> np.ndarray:
    """Row-conv depth_to_space: dilate ONLY the h axis and leave the w axis
    packed in the channel dim — out'[r*g+a, w, b*c+ch] = x[g, w, (a*r+b)*c
    + ch] (kernel tap [r-1-a, 0], lhs_dilation (r, 1), pad ((r-1, r-1), 0)),
    then out'.reshape(N, rH, rW, c) is a FREE reshape (minor order (w, b,
    ch) == ((rw+b), ch)). vs the 2-D-dilated form this keeps r*c output
    lanes instead of c and executes r× fewer MACs."""
    k = np.zeros((r, 1, r * r * c, r * c), np.float32)
    for a in range(r):
        for b in range(r):
            for ch in range(c):
                k[r - 1 - a, 0, (a * r + b) * c + ch, b * c + ch] = 1.0
    return k


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """Inverse of space_to_depth.

    Small original channel counts (c <= 8, e.g. the final RGB image) run as
    a dilated selection conv instead of the 6-D transpose: the interleave's
    minor axis is c, and a c=3 transpose runs at ~2% lane efficiency on TPU
    (measured 2.8 ms for a [4, 1024, 1024, 3] unpack vs ~1.2 ms less via the
    conv form, round 3). The conv's zero-inflated MACs are trivial at these
    widths; larger c keeps the reshape/transpose (the conv form's MACs scale
    with c² and would hit the MXU for real)."""
    import os

    n, hp, wp, cc = x.shape
    c = cc // (r * r)
    # Conv-form threshold on the selection conv's contraction depth r²c
    # (= executed MACs per output element): the pSp mid-synthesis unpack
    # (r=2, c=64, depth 256) lowers to a 3.2 ms/step 6-D transpose copy at
    # bs16 while its conv form is ~1 ms of MXU (on-chip A/B round 4:
    # 159.1 -> 162.7 imgs/s). A plain max-C threshold regressed the
    # flagship/GAN r=4 sites (depth 16c: GAN bs8 68 -> 63 imgs/s), so the
    # gate is depth-based: default 256 keeps every legacy c<=8 site
    # (depth <= 128 at r<=4) plus the r=2 c<=64 ones.
    # FMI_D2S_SLICE_MAX_RRC: slice+stack form — row a of each r-block is a
    # contiguous rc-wide lane slice of the packed channels ((w, b, ch) minor
    # order is ALREADY the unpacked order), and the h-interleave is a
    # major-dim stack whose rows move contiguously. Pure bandwidth (no MXU,
    # no lane-starved conv emit). Default 64 covers the tiny-c full-res
    # unpacks (r2c3=12, r4c3=48) — on-chip A/B round 4: pSp 178.1 -> 180.2,
    # GAN bs8 69.3 -> 69.6, flagship 225.1 -> 225.3 imgs/s; the r=2 c=64
    # mid-synthesis site (depth 256) stays on the selection conv.
    slice_max = int(os.environ.get("FMI_D2S_SLICE_MAX_RRC", "64"))
    if slice_max > 0 and r * r * c <= slice_max:
        y = x.reshape(n, hp, wp, r, r * c)
        z = jnp.stack([y[:, :, :, a, :] for a in range(r)], axis=2)
        return z.reshape(n, hp * r, wp * r, c)
    if r * r * c <= int(os.environ.get("FMI_D2S_CONV_MAX_RRC", "256")) \
            or c <= int(os.environ.get("FMI_D2S_CONV_MAX_C", "8")):
        # FMI_D2S_ROWCONV=1 switches every conv-form site to the h-dilated
        # row kernel; FMI_D2S_ROWCONV_MAX_C scopes it to small c only (the
        # global switch measured -9 imgs/s at the pSp bench because the
        # c=64 mid-synthesis site regressed, masking the c=3 final-image
        # unpack's behavior).
        if (os.environ.get("FMI_D2S_ROWCONV", "0") == "1"
                or c <= int(os.environ.get("FMI_D2S_ROWCONV_MAX_C", "0"))):
            k = jnp.asarray(_d2s_row_kernel_np(r, c), x.dtype)
            y = jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1),
                padding=((r - 1, r - 1), (0, 0)), lhs_dilation=(r, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.reshape(n, hp * r, wp * r, c)
        k = jnp.asarray(_d2s_kernel_np(r, c), x.dtype)
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1),
            padding=((r - 1, r - 1), (r - 1, r - 1)), lhs_dilation=(r, r),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(n, hp, wp, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hp * r, wp * r, c)


@functools.lru_cache(maxsize=None)
def _conv3x3_scatter(r: int, kh: int, kw: int) -> np.ndarray:
    """0/1 matrix M[sh, sw, P, Q, dh, dw]: original tap (dh, dw) of output
    offset Q=(a*r+b) reads input offset P=(ap*r+bp) of the block at shift
    (sh-1, sw-1). Zero-padded block shifts reproduce the original conv's
    zero padding exactly."""
    m = np.zeros((3, 3, r * r, r * r, kh, kw), np.float32)
    for a in range(r):
        for dh in range(kh):
            src_h = a + dh - (kh // 2)
            sh = src_h // r
            ap = src_h - sh * r
            for b in range(r):
                for dw in range(kw):
                    src_w = b + dw - (kw // 2)
                    sw = src_w // r
                    bp = src_w - sw * r
                    m[sh + 1, sw + 1, ap * r + bp, a * r + b, dh, dw] = 1.0
    return m


def pack_conv3x3_kernel(w: jax.Array, r: int) -> jax.Array:
    """Packed-grid kernel for a stride-1, pad-k//2 conv. w: [kh, kw, ci, co]
    -> [3, 3, r²ci, r²co] (mostly zeros; the MXU does not care and the fat
    channel dims are what make it fast)."""
    kh, kw, ci, co = w.shape
    m = jnp.asarray(_conv3x3_scatter(r, kh, kw), w.dtype)
    # wp[sh, sw, P*ci + i, Q*co + o] = sum_{dh,dw} M[sh,sw,P,Q,dh,dw] w[dh,dw,i,o]
    wp = jnp.einsum("stPQhw,hwio->stPiQo", m, w)
    return wp.reshape(3, 3, r * r * ci, r * r * co)


def packed_conv3x3(x: jax.Array, w: jax.Array, bias, r: int) -> jax.Array:
    """3x3 (or 1x1) stride-1 'same' conv at full resolution, executed on the
    packed representation. x: [N, Hp, Wp, r²ci]; w: [kh, kw, ci, co]."""
    if r == 1:
        return conv2d(x, w, bias, padding=w.shape[0] // 2)
    wp = pack_conv3x3_kernel(w, r).astype(x.dtype)
    y = conv2d(x, wp, None, padding=1)
    if bias is not None:
        y = y + jnp.tile(bias, r * r).astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _conv3x3_half_scatter(r: int, kh: int, kw: int) -> np.ndarray:
    """Scatter for a stride-1 'same' conv consumed at packing r from an
    input packed at r/2 on the DOUBLE-density grid (an [N, 2Hp, 2Wp,
    (r/2)²ci] map): a stride-2 conv with a 4x4 window of half-cells.
    Executed FLOPs scale with (r/2)²·r² instead of r⁴ — for the flagship
    Output head (r=4) that's 206 GF vs 461 GF per step, the difference
    between paying the r²-dense inflation on BOTH operand packings or
    only on the output one. M[th, tw, P, Q, dh, dw]: original tap
    (dh, dw) of output offset Q=(a*r+b) reads half-cell offset
    P=(ap*rh+bp) of the half-cell at window tap (th, tw)."""
    rh = r // 2
    m = np.zeros((4, 4, rh * rh, r * r, kh, kw), np.float32)
    for a in range(r):
        for dh in range(kh):
            u = a + dh - (kh // 2)
            hc = u // rh          # half-cell shift relative to 2*G
            ap = u - hc * rh
            th = hc + 1           # window tap (pad 1 on the left)
            for b in range(r):
                for dw in range(kw):
                    v = b + dw - (kw // 2)
                    wc = v // rh
                    bp = v - wc * rh
                    m[th, wc + 1, ap * rh + bp, a * r + b, dh, dw] = 1.0
    return m


def pack_conv3x3_half_kernel(w: jax.Array, r: int) -> jax.Array:
    """w: [kh, kw, ci, co] -> [4, 4, (r/2)²ci, r²co] for the half-in form."""
    kh, kw, ci, co = w.shape
    rh = r // 2
    m = jnp.asarray(_conv3x3_half_scatter(r, kh, kw), w.dtype)
    wp = jnp.einsum("stPQhw,hwio->stPiQo", m, w)
    return wp.reshape(4, 4, rh * rh * ci, r * r * co)


def packed_conv3x3_half_in(x: jax.Array, w: jax.Array, bias, r: int) -> jax.Array:
    """Stride-1 'same' conv at full resolution, input packed at r/2 on the
    double grid ([N, 2Hp, 2Wp, (r/2)²ci]), output packed at r
    ([N, Hp, Wp, r²co]). Zero padding matches the original conv exactly."""
    assert r % 2 == 0 and r >= 2
    wp = pack_conv3x3_half_kernel(w, r).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, r * r).astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _convT_scatter(r_in: int) -> np.ndarray:
    """Scatter for convT(k=3, stride=2, pad=1, output_pad=1) from an
    r_in-packed input to a (2*r_in)-packed output on the same block grid.

    out[p] = sum_t W[t] * x[(p+1-t)/2] (p+1-t even). With p = 2m+alpha:
    alpha=0 -> (t=1, q=m); alpha=1 -> (t=2, q=m) and (t=0, q=m+1).
    M[sh, sw, P, Q, th, tw] over block shifts {0, +1}.
    """
    r_out = 2 * r_in
    m = np.zeros((2, 2, r_in * r_in, r_out * r_out, 3, 3), np.float32)

    def taps(alpha, a):
        # (kernel tap t, block shift s, packed input offset) for one axis
        pairs = [(alpha + 1, 0)]
        if alpha == 1:
            pairs.append((alpha - 1, 1))
        out = []
        for t, q_off in pairs:
            src = a + q_off
            s = src // r_in
            ap = src - s * r_in
            out.append((t, s, ap))
        return out

    for a in range(r_in):
        for alpha in (0, 1):
            A = 2 * a + alpha
            for th, sh, ap in taps(alpha, a):
                for b in range(r_in):
                    for beta in (0, 1):
                        B = 2 * b + beta
                        for tw, sw, bp in taps(beta, b):
                            m[sh, sw, ap * r_in + bp, A * r_out + B, th, tw] = 1.0
    return m


def pack_conv_transpose2x_kernel(w: jax.Array, r_in: int) -> jax.Array:
    """Packed kernel for ConvTranspose2d(k=3, s=2, p=1, op=1). w: [3, 3, ci, co]
    (HWIO as stored by nn.layers.ConvTranspose2d) -> [2, 2, r_in²ci, (2r_in)²co]."""
    _, _, ci, co = w.shape
    m = jnp.asarray(_convT_scatter(r_in), w.dtype)
    wp = jnp.einsum("stPQhw,hwio->stPiQo", m, w)
    return wp.reshape(2, 2, r_in * r_in * ci, (2 * r_in) ** 2 * co)


def packed_conv_transpose2x(x: jax.Array, w: jax.Array, bias, r_in: int) -> jax.Array:
    """ConvTranspose2d(k=3, s=2, p=1, op=1) from r_in-packed input to
    (2*r_in)-packed output on the same block grid. r_in=1 accepts the plain
    [N, H, W, C] map and returns the subpixel-packed [N, H, W, 4C] result."""
    r_out = 2 * r_in
    wp = pack_conv_transpose2x_kernel(w, r_in).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(1, 1), padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, r_out * r_out).astype(y.dtype)
    return y


def packed_instance_norm_act(x, scale, bias, r: int, act: str = "LeakyReLU",
                             slope: float = 0.1, eps: float = 1e-5):
    """InstanceNorm2d(+affine) + activation over an r-packed map: per-sample,
    per-ORIGINAL-channel stats pool over the spatial axes and the r² packed
    slots (identical math to nn.layers.InstanceNorm2d; f32 stats)."""
    n, hp, wp, cc = x.shape
    c = cc // (r * r)
    xv = x.reshape(n, hp, wp, r * r, c)
    x32 = xv.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    # one-pass stats (see nn/layers.py InstanceNorm2d)
    sq = jnp.mean(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "LeakyReLU":
        y = jnp.where(y >= 0, y, y * slope)
    elif act == "ReLU":
        y = jnp.maximum(y, 0)
    elif act != "none":
        raise NotImplementedError(act)
    return y.astype(x.dtype).reshape(n, hp, wp, cc)


def packed_leaky_relu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return jax.nn.leaky_relu(x, slope)


def packed_block_mean(x: jax.Array, r: int) -> jax.Array:
    """Mean over each r x r block — adaptive_avg_pool2d with an integer
    factor r, computed on the packed form: [N, Hp, Wp, r²C] -> [N, Hp, Wp, C]."""
    n, hp, wp, cc = x.shape
    c = cc // (r * r)
    return jnp.mean(x.reshape(n, hp, wp, r * r, c), axis=3)


# ---------------------------------------------------------------------------
# Packed execution of the StyleGAN2 synthesis tail (models/stylegan2.py).
#
# The reference's StyledConv upsample is ConvTranspose2d(k=3, s=2, p=0) followed
# by an upfirdn2d blur with pads (1, 1) (stylegan2/model.py:251-277, 36-60).
# Both are linear, so they compose into ONE 6-tap stride-2 upsampling stencil:
#
#   y[o] = sum_i C[o - 2i] x[i],   C[j] = sum_t f[t] W[j + 2 - t],  j in [-2, 3]
#
# (per axis; f is the gained blur kernel, W the convT tap). Each output parity
# has exactly 3 taps per axis, so on the packed grid the whole upsample+blur is
# a single 3x3 window conv from r-packed input to 2r-packed output with ZERO
# executed-FLOP inflation at r_in=1 (the [3, 3, ci, 4co] kernel holds exactly
# the true 9 taps x 4 phases). ToRGB's skip upsample (upfirdn2d up=2, pads
# (2, 1) -> taps j in [-1, 2]) uses the same scatter with a per-channel
# (depthwise) kernel. See models/stylegan2.py Generator for the execution
# policy.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _up2_scatter(r_in: int, j_min: int, j_max: int) -> np.ndarray:
    """Scatter for y[o] = sum_i C[o - 2i] x[i] maps (stride-2 upsampling with
    taps j in [j_min, j_max]), from r_in-packed input to (2*r_in)-packed
    output on the SAME block grid. Returns M[sh, sw, P, Q, a, b] over block
    shifts {-1, 0, +1} with a = jh - j_min (tap index)."""
    r_out = 2 * r_in
    nj = j_max - j_min + 1
    m = np.zeros((3, 3, r_in * r_in, r_out * r_out, nj, nj), np.float32)

    def taps(A):
        out = []
        for j in range(j_min, j_max + 1):
            if (A - j) % 2:
                continue
            q = (A - j) // 2
            s = q // r_in  # floor division: q < 0 -> previous block
            p = q - s * r_in
            assert -1 <= s <= 1, (r_in, j_min, j_max, A, j, s)
            out.append((j - j_min, s, p))
        return out

    for A in range(r_out):
        for a, sh, ap in taps(A):
            for B in range(r_out):
                for b, sw, bp in taps(B):
                    m[sh + 1, sw + 1, ap * r_in + bp, A * r_out + B, a, b] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _upsample_compose(r_in: int, blur_taps: tuple, gain: float) -> np.ndarray:
    """Static part of the fused convT(k=3, s=2, p=0) + blur(pads (1, 1))
    packed kernel: S[sh, sw, P, Q, th, tw] = sum_ab M[..a, b] H[a, th] H[b, tw]
    with H[alpha, t] = g * k1[alpha - t] (the per-axis blur/convT composition,
    alpha = j + 2)."""
    k1 = np.asarray(blur_taps, np.float32)
    k1 = k1 / k1.sum()
    g = float(np.sqrt(gain))
    nb = len(k1)
    h = np.zeros((4 + nb - 2, 3), np.float32)  # alpha in [0, nb+1], t in [0,2]
    for alpha in range(h.shape[0]):
        for t in range(3):
            tau = alpha - t
            if 0 <= tau < nb:
                h[alpha, t] = g * k1[tau]
    m = _up2_scatter(r_in, -2, h.shape[0] - 3)  # j_max = (nb-2)+1
    return np.einsum("swPQab,at,bu->swPQtu", m, h, h)


def pack_upsample_conv_kernel(w: jax.Array, r_in: int,
                              blur_taps=(1, 3, 3, 1)) -> jax.Array:
    """Packed kernel for the fused modulated-upsample: w [3, 3, ci, co]
    (torch convT semantics as in ops/conv.py) -> [3, 3, r²ci, (2r)²co].
    Blur gain is factor² = 4 (upfirdn Upsample semantics, model.py:30-49)."""
    _, _, ci, co = w.shape
    s = jnp.asarray(_upsample_compose(r_in, tuple(blur_taps), 4.0), jnp.float32)
    wp = jnp.einsum("swPQtu,tuio->swPiQo", s, w.astype(jnp.float32))
    return wp.reshape(3, 3, r_in * r_in * ci, (2 * r_in) ** 2 * co)


def packed_upsample_conv(x: jax.Array, w: jax.Array, r_in: int,
                         blur_taps=(1, 3, 3, 1)) -> jax.Array:
    """Fused ConvTranspose2d(k=3, s=2, p=0) + blur(pad (1, 1)): r_in-packed
    [N, G, G, r²ci] -> (2*r_in)-packed [N, G, G, (2r)²co] on the same grid
    (i.e. H -> 2H at full resolution). Exact same math as the two-op pipeline."""
    wp = pack_upsample_conv_kernel(w, r_in, blur_taps).astype(x.dtype)
    return conv2d(x, wp, None, padding=1)


@functools.lru_cache(maxsize=None)
def _skip_up_kernel_np(r_in: int, blur_taps: tuple, gain: float) -> np.ndarray:
    """Static per-channel kernel for upfirdn2d(up=2, pad=(2, 1)) (the ToRGB
    skip upsample, model.py:30-49): SK[sh, sw, P, Q] with taps j in [-1, 2],
    D[alpha] = g1 * k1[alpha] per axis."""
    k1 = np.asarray(blur_taps, np.float32)
    k1 = k1 / k1.sum()
    d = np.sqrt(gain) * k1  # per-axis taps, alpha = j + 1 in [0, 3]
    m = _up2_scatter(r_in, -1, 2)
    return np.einsum("swPQab,a,b->swPQ", m, d, d)


def packed_skip_upsample(x: jax.Array, r_in: int,
                         blur_taps=(1, 3, 3, 1)) -> jax.Array:
    """ToRGB skip upsample (upsample_2d, factor 2) on the packed form:
    [N, G, G, r²C] -> [N, G, G, (2r)²C], per-channel FIR.

    FMI_SKIP_UP_VPU (default 1): at r_in=1 (the only live site at the
    default packing — the 1024² ToRGB's 512²x3 skip) the per-channel FIR
    runs as shifted scaled adds on the VPU instead of a selection conv:
    the conv form funnels a 27-deep contraction into 12 of 128 output
    lanes and measured 3.62 ms/step at the pSp bs16 bench for ~0.16 ms of
    actual bandwidth (round-5 fused-program trace, convolution_add_fusion).
    Coefficients come from the same _skip_up_kernel_np stencil, so the math
    is the conv form's, term for term."""
    import os

    n, g1, g2, cc = x.shape
    c = cc // (r_in * r_in)
    sk = _skip_up_kernel_np(r_in, tuple(blur_taps), 4.0)
    if r_in == 1 and os.environ.get("FMI_SKIP_UP_VPU", "1") == "1":
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = []
        for q in range(4):
            acc = None
            for s in range(3):
                for t in range(3):
                    coef = float(sk[s, t, 0, q])
                    if coef == 0.0:
                        continue
                    term = coef * xp[:, s:s + g1, t:t + g2, :]
                    acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.concatenate(outs, axis=-1).astype(x.dtype)
    wp = jnp.einsum("swPQ,cd->swPcQd", jnp.asarray(sk),
                    jnp.eye(c, dtype=jnp.float32))
    wp = wp.reshape(3, 3, r_in * r_in * c, (2 * r_in) ** 2 * c)
    return conv2d(x, wp.astype(x.dtype), None, padding=1)


def pack_conv1x1_kernel(w: jax.Array, r: int) -> jax.Array:
    """1x1 conv on the packed grid WITHOUT the 3x3 window of
    pack_conv3x3_kernel (9x fewer executed FLOPs): block-diagonal
    [1, 1, r²ci, r²co]."""
    _, _, ci, co = w.shape
    eye = jnp.eye(r * r, dtype=jnp.float32)
    wp = jnp.einsum("PQ,io->PiQo", eye, w[0, 0].astype(jnp.float32))
    return wp.reshape(1, 1, r * r * ci, r * r * co)


def conv1x1_w_grouped(x: jax.Array, wp: jax.Array, g: int) -> jax.Array:
    """1x1 conv with g adjacent w-cells fused into one matmul row: x
    [N, GH, GW, Ci] viewed as [N, GH, GW/g, g*Ci], kernel kron(I_g, wp) —
    g× the executed MACs (block-diagonal zeros) for g× the output lanes.
    Exact same dot products as conv2d(x, wp); both reshapes are free
    (contiguous minor order). Built for the packed ToRGB 1x1 whose r²·3
    output lanes run at ~4% MXU efficiency (pSp trace: to_rgbs_6/7 at
    3.7 / 1.3 TF/s)."""
    n, gh, gw, ci = x.shape
    co = wp.shape[-1]
    if g <= 1 or gw % g:
        return jax.lax.conv_general_dilated(
            x, wp.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    eye = jnp.eye(g, dtype=jnp.float32)
    wg = jnp.einsum("qp,io->qipo", eye, wp[0, 0].astype(jnp.float32))
    wg = wg.reshape(1, 1, g * ci, g * co).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x.reshape(n, gh, gw // g, g * ci), wg, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(n, gh, gw, co)


def packed_channel_scale(x: jax.Array, s: jax.Array, r: int) -> jax.Array:
    """x [N, G, G, r²C] * s [N, C] broadcast per original channel.

    FLAT form: the packed channel axis is slot-major (channel j = slot*C +
    ch), so tiling s r² times along its channel axis gives the per-packed-
    channel scale directly — bit-identical to the 5-D reshape-multiply but
    it stays in the conv's [N, G, G, r²C] layout (the 5-D view forced
    relayout copies around every modulated conv at the pSp 512²/1024²
    stages, same failure mode as the noise epilogue fixed in round 3)."""
    n, g1, g2, cc = x.shape
    c = cc // (r * r)
    s_flat = jnp.tile(s, (1, r * r))  # [N, r²C], element j scales ch j % C
    return x * s_flat[:, None, None, :].astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _noise_expand_kernel_np(r: int, c: int) -> np.ndarray:
    """Stride-r selection conv turning a full-resolution [N, rG, rG, 1]
    noise map into the FLAT packed [N, G, G, r²c] layout (slot-major,
    repeated per original channel): k[a, b, 0, (a*r+b)*c + ch] = 1."""
    k = np.zeros((r, r, 1, r * r * c), np.float32)
    for a in range(r):
        for b in range(r):
            k[a, b, 0, (a * r + b) * c:(a * r + b) * c + c] = 1.0
    return k


def noise_expand_packed(noise: jax.Array, r: int, c: int) -> jax.Array:
    """space_to_depth(noise, r) repeated per original channel, as ONE
    stride-r conv.

    Bit-exact vs the reshape/transpose + jnp.repeat formulation (every
    output element is a single 1.0*x tap plus exact zeros), but the conv
    comes out directly in the convolution layout XLA assigns the rest of
    the packed synthesis stage — the broadcast+reshape form made XLA pick
    a transposed layout for the elementwise noise chain and pay
    full-tensor relayout copies on the 512²/1024² stages (pSp bs16 trace:
    copy.111/116 + broadcast.232/239 ~= 9.7 ms/iter)."""
    k = jnp.asarray(_noise_expand_kernel_np(r, c), noise.dtype)
    return conv2d(noise, k, stride=r, padding=0)
