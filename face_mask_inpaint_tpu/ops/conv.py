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

__all__ = ["conv2d", "conv_transpose2d", "pixel_shuffle", "depthwise_conv2d"]

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
