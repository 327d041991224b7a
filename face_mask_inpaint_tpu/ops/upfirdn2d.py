"""upfirdn2d — the StyleGAN2 resampling primitive, TPU-native.

Semantics (reference modules/psp/stylegan2/op/upfirdn2d_kernel.cu and the
unreachable torch fallback op/upfirdn2d.py:150-184):

  1. zero-upsample by ``up`` (insert up-1 zeros between samples),
  2. pad spatially by (pad0, pad1) per edge (negative pad crops),
  3. 2-D FIR filter with ``kernel`` (true convolution, i.e. flipped
     cross-correlation),
  4. downsample by ``down`` (keep every down-th sample).

Output size: (H*up + pad0 + pad1 - kh) // down + 1 (same for W).

TPU design: the whole pipeline is one ``lax.conv_general_dilated`` call with
``lhs_dilation=up``, ``window_strides=down`` and asymmetric padding — XLA
lowers this to a single fused depthwise convolution with no materialized
dilated intermediate. The FIR kernel is shared across channels
(feature_group_count=C). Gradients come from JAX autodiff of the conv, which
reproduces the reference's flipped-kernel double-backward
(op/upfirdn2d.py:98-117) analytically.

A Pallas kernel (`face_mask_inpaint_tpu.ops.pallas.upfirdn2d_pallas`) provides
a fused fast path for the separable blur kernels used by StyleGAN2; this
module is the semantic reference and autodiff path.

Layout: NHWC (the reference is NCHW).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from face_mask_inpaint_tpu.ops.conv import depthwise_conv2d

__all__ = ["upfirdn2d", "make_kernel", "upsample_2d", "downsample_2d", "blur"]


def make_kernel(k) -> np.ndarray:
    """Normalized FIR kernel from a 1-D or 2-D tap list.

    Matches reference stylegan2/model.py:19-27: outer-product a 1-D kernel and
    normalize to unit sum. Returns a STATIC numpy array: blur kernels are
    compile-time constants, and keeping them concrete (not tracers) lets the
    dispatcher choose the Pallas kernel inside jit.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / np.sum(k)


_IMPL = "lax"  # 'lax' (default) | 'pallas' | 'auto' (pallas on TPU)
# Default is the lax fused-conv path: on-chip measurements (round 1) show
# XLA's conv handles these FIR resamplings well (StyleGAN2 1024^2 synthesis
# 79.6 imgs/s @ bs2), while compiling several large-shape Mosaic kernels in
# one graph can OOM-kill AOT compile helpers. The Pallas kernels are fully
# tested (on-chip parity for blur/up2/down2) and selectable via set_impl.


def set_impl(name: str) -> None:
    """Select the upfirdn2d backend: 'auto', 'lax', or 'pallas'."""
    global _IMPL
    assert name in ("auto", "lax", "pallas")
    _IMPL = name


def _use_pallas() -> bool:
    if _IMPL == "lax":
        return False
    if _IMPL == "pallas":
        return True
    return jax.devices()[0].platform in ("tpu", "axon")


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jax.Array:
    """Apply up-FIR-down resampling to an NHWC array.

    kernel: [kh, kw] float filter, applied as a true convolution.
    pad: (pad0, pad1) applied to both spatial dims (before filtering,
    after upsampling), negative values crop.

    Dispatches to the Pallas TPU kernel (ops/pallas/upfirdn2d_pallas.py) for
    the supported separable modes; the lax fused-conv formulation is the
    fallback and autodiff reference.
    """
    # Gate the Pallas path to large maps: small blurs are trivial bandwidth
    # (lax is fine) and every distinct shape adds a Mosaic kernel compile —
    # StyleGAN2 at 1024^2 would otherwise ship ~17 kernel specializations in
    # one graph, which can OOM-kill AOT compile helpers.
    large = x.shape[1] * x.shape[2] >= 256 * 256
    if large and _use_pallas() and not isinstance(kernel, jax.core.Tracer):
        from face_mask_inpaint_tpu.ops.pallas.upfirdn2d_pallas import (
            upfirdn2d_pallas,
        )

        return upfirdn2d_pallas(x, kernel, up, down, (int(pad[0]), int(pad[1])))
    return upfirdn2d_lax(x, kernel, up=up, down=down, pad=pad)


def upfirdn2d_lax(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jax.Array:
    """The single-fused-conv formulation (also the autodiff reference)."""
    pad0, pad1 = int(pad[0]), int(pad[1])
    # Flip the FIR kernel: conv_general_dilated is cross-correlation, the
    # reference CUDA kernel computes true convolution.
    k = jnp.flip(kernel, (0, 1))
    # lhs_dilation produces h*up - (up-1) samples (no trailing zeros); the
    # zero-insertion spec keeps them, so fold the missing up-1 zeros into the
    # high-side padding.
    hi = pad1 + (up - 1)
    return depthwise_conv2d(
        x,
        k,
        stride=(down, down),
        padding=((pad0, hi), (pad0, hi)),
        lhs_dilation=(up, up) if up != 1 else None,
    )


def upsample_2d(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    """StyleGAN2 Upsample module (stylegan2/model.py:30-49) on NHWC.

    kernel must already be normalized (make_kernel); gain factor**2 applied.
    """
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel * (factor**2), up=factor, down=1, pad=(pad0, pad1))


def downsample_2d(x: jax.Array, kernel: jax.Array, factor: int = 2) -> jax.Array:
    """StyleGAN2 Downsample module (stylegan2/model.py:52-71) on NHWC."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur(
    x: jax.Array, kernel: jax.Array, pad: tuple[int, int], upsample_factor: int = 1
) -> jax.Array:
    """StyleGAN2 Blur module (stylegan2/model.py:74-91) on NHWC."""
    k = kernel
    if upsample_factor > 1:
        k = k * (upsample_factor**2)
    return upfirdn2d(x, k, up=1, down=1, pad=pad)
