"""Torch-semantics convolution primitives on NHWC/HWIO layouts.

These are thin, shape-exact wrappers around ``jax.lax.conv_general_dilated``.
Weight layout is HWIO (kh, kw, in, out) — XLA's preferred TPU layout. The
torch->JAX weight converter permutes OIHW -> HWIO (and IOHW -> HWIO for
transposed convs), see tools/convert_torch.py.

``conv_transpose2d`` reproduces ``nn.ConvTranspose2d(stride, padding,
output_padding)`` exactly via input dilation + asymmetric padding + a
spatially-flipped kernel (the textbook transpose-as-fractionally-strided-conv
identity). The reference uses it in ResBlockDecoder
(base_function.py:308-364, k=3, stride=2, padding=1, output_padding=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv2d", "conv2d_packed_dx", "conv_transpose2d", "pixel_shuffle",
           "depthwise_conv2d"]

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] | str = 0,
    dilation: int | tuple[int, int] = 1,
    groups: int = 1,
) -> jax.Array:
    """2-D cross-correlation matching torch.nn.functional.conv2d.

    x: [N, H, W, Cin]; weight: [kh, kw, Cin//groups, Cout]; bias: [Cout].
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    y = jax.lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_DIMS,
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    output_padding: int | tuple[int, int] = 0,
) -> jax.Array:
    """2-D transposed convolution matching torch.nn.functional.conv_transpose2d.

    x: [N, H, W, Cin]; weight: [kh, kw, Cin, Cout] (converter maps torch's
    IOHW layout here); bias: [Cout].

    Identity used: convT(x, W; s, p, op) == conv(dilate_s(x), flip_hw(W))
    with per-edge padding (k-1-p, k-1-p+op). Output size is
    (H-1)*s - 2p + k + op, as in torch.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(output_padding, int):
        output_padding = (output_padding, output_padding)
    kh, kw = weight.shape[0], weight.shape[1]
    pads = (
        (kh - 1 - padding[0], kh - 1 - padding[0] + output_padding[0]),
        (kw - 1 - padding[1], kw - 1 - padding[1] + output_padding[1]),
    )
    w_flip = weight[::-1, ::-1, :, :]
    y = jax.lax.conv_general_dilated(
        x,
        w_flip.astype(x.dtype),
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_DIMS,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def depthwise_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] | tuple[tuple[int, int], tuple[int, int]] = 0,
    lhs_dilation: tuple[int, int] | None = None,
) -> jax.Array:
    """Apply one 2-D [kh, kw] filter to every channel independently.

    Used by the upfirdn2d reference path and SSIM gaussian windows. The kernel
    is broadcast across channels via feature_group_count == C.
    """
    c = x.shape[-1]
    kh, kw = kernel.shape
    w = jnp.broadcast_to(kernel.astype(x.dtype)[:, :, None, None], (kh, kw, 1, c))
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DIMS,
        feature_group_count=c,
    )


def pixel_shuffle(x: jax.Array, upscale_factor: int) -> jax.Array:
    """NHWC equivalent of torch.nn.PixelShuffle.

    torch semantics on NCHW: channel index c = c_out * r^2 + r1 * r + r2 maps
    to output (c_out, h*r + r1, w*r + r2). On NHWC we reshape the trailing
    channel axis accordingly.
    """
    r = upscale_factor
    n, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r1, w, r2, c_out
    return x.reshape(n, h * r, w * r, c_out)


@jax.custom_vjp
def _conv2d_packed_dx_core(x: jax.Array, weight: jax.Array) -> jax.Array:
    """3x3 stride-1 'same' conv (no bias) whose INPUT gradient executes
    space-to-depth packed.

    For a small-ci conv (VGG conv1_1 ci=3 co=64; the discriminator's image
    stem), the backward-to-input conv dX = dY * rot180(W)^T has only ci=3
    output lanes — traced at 21.7 TF/s (VGG, 3 loss pairs x 1.42 ms/step)
    and 1.2 TF/s (D block0). The packed form computes dX at r=4 packing via
    the half-in stencil (dY packed at r/2=2, output 16*ci lanes) and
    unpacks — the same lane-filling trade the packed decoder tail uses
    (the reference ships this op family as CUDA:
    modules/psp/stylegan2/op/); a vjp-level execution strategy with
    identical math."""
    return conv2d(x, weight, None, padding=1)


def _cpdx_fwd(x, weight):
    return conv2d(x, weight, None, padding=1), (x, weight)


def _cpdx_bwd(res, dy):
    x, weight = res
    _, vjp_w = jax.vjp(lambda w_: conv2d(x, w_, None, padding=1), weight)
    (dw,) = vjp_w(dy)
    w_g = jnp.flip(weight, (0, 1)).transpose(0, 1, 3, 2)  # [kh, kw, co, ci]
    n, h, wd, _ = x.shape
    if h % 4 == 0 and wd % 4 == 0:
        from face_mask_inpaint_tpu.ops.packed import (
            depth_to_space, packed_conv3x3_half_in, space_to_depth)

        dyp = space_to_depth(dy, 2)
        z = packed_conv3x3_half_in(dyp, w_g.astype(dy.dtype), None, 4)
        dx = depth_to_space(z, 4).astype(x.dtype)
    else:
        dx = conv2d(dy, w_g.astype(dy.dtype), None, padding=1).astype(x.dtype)
    return dx, dw


_conv2d_packed_dx_core.defvjp(_cpdx_fwd, _cpdx_bwd)


def conv2d_packed_dx(x: jax.Array, weight: jax.Array, bias=None) -> jax.Array:
    """See _conv2d_packed_dx_core; the bias adds outside the custom vjp so
    its gradient (and None handling) stays with JAX."""
    y = _conv2d_packed_dx_core(x, weight)
    return y + bias.astype(y.dtype) if bias is not None else y
