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


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """Inverse of space_to_depth."""
    n, hp, wp, cc = x.shape
    c = cc // (r * r)
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
