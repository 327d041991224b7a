"""Core layer library: convs with optional spectral norm, norms, activations.

Functional re-design of the reference's layer zoo
(modules/pluralistic_model/base_function.py, external_function.py):

- Spectral normalization (external_function.py:16-72) is stateful in torch —
  u/v power-iteration vectors mutated on every forward. Here they live in the
  flax variable collection ``"spectral"`` and are updated only when that
  collection is marked mutable (i.e. inside a training step); ``sigma`` is
  always recomputed from the current weight so gradients flow through it,
  matching the torch implementation where u/v are requires_grad=False buffers.
- Norm/activation registries mirror get_norm_layer / get_nonlinearity_layer
  (base_function.py:41-66).
- Initializer registry mirrors init_weights (base_function.py:13-38) with the
  reference's fixed gain=0.02 default applied by the factory functions.

Layout: NHWC activations, HWIO kernels.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.ops.conv import conv2d, conv_transpose2d

Dtype = Any

__all__ = [
    "get_initializer",
    "get_activation",
    "Activation",
    "Conv2d",
    "ConvTranspose2d",
    "Dense",
    "BatchNorm2d",
    "InstanceNorm2d",
    "make_norm",
    "PReLU",
]


# ---------------------------------------------------------------------------
# Initializers (base_function.py:13-38)
# ---------------------------------------------------------------------------

def get_initializer(init_type: str, gain: float = 0.02) -> Callable:
    """Weight initializer registry matching init_weights semantics.

    normal: N(0, gain); xavier: xavier_normal(gain); kaiming: fan_in, a=0;
    orthogonal: orthogonal * gain. Biases are zero-initialized by the layers.
    """
    if init_type == "normal":
        return nn.initializers.normal(stddev=gain)
    if init_type == "xavier":
        # torch xavier_normal_: std = gain * sqrt(2 / (fan_in + fan_out))
        return nn.initializers.variance_scaling(gain * gain * 2.0, "fan_avg", "normal")
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2 / fan_in)
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=gain)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


# ---------------------------------------------------------------------------
# Activations (base_function.py:54-66)
# ---------------------------------------------------------------------------

class PReLU(nn.Module):
    """torch.nn.PReLU: per-channel (num_parameters=C) or single shared slope."""

    num_parameters: int = 1
    init_value: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha",
            lambda _key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.num_parameters,),
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class Activation(nn.Module):
    """Registry-dispatched activation; PReLU carries a learned parameter."""

    kind: str = "ReLU"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kind == "ReLU":
            return jax.nn.relu(x)
        if self.kind == "SELU":
            return jax.nn.selu(x)
        if self.kind == "LeakyReLU":
            return jax.nn.leaky_relu(x, negative_slope=0.1)
        if self.kind == "PReLU":
            return PReLU(name="prelu")(x)
        raise NotImplementedError(f"activation layer [{self.kind}] is not found")


def get_activation(kind: str) -> Callable[[jax.Array], jax.Array]:
    """Parameter-free activation fn for the given registry name (not PReLU)."""
    table = {
        "ReLU": jax.nn.relu,
        "SELU": jax.nn.selu,
        "LeakyReLU": functools.partial(jax.nn.leaky_relu, negative_slope=0.1),
    }
    if kind not in table:
        raise NotImplementedError(f"activation layer [{kind}] is not found")
    return table[kind]


# ---------------------------------------------------------------------------
# Spectral normalization helpers
# ---------------------------------------------------------------------------

def _l2normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


class _SpectralMixin:
    """Shared power-iteration logic for spectrally-normalized layers.

    The weight is reshaped to a matrix with the output dimension as rows
    (sigma is invariant to the column flattening order, so HWIO vs OIHW
    flattening gives identical dynamics to the torch version).
    """

    def _spectral_normalize(self, w: jax.Array, out_dim: int) -> jax.Array:
        w_mat = w.reshape(-1, out_dim)  # [width, out]
        width = w_mat.shape[0]
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(jax.random.normal(self.make_rng("params"), (out_dim,))),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2normalize(jax.random.normal(self.make_rng("params"), (width,))),
        )
        u, v = u_var.value, v_var.value
        w32 = jax.lax.stop_gradient(w_mat).astype(jnp.float32)
        # One power iteration per call (power_iterations=1 in the reference).
        v = _l2normalize(w32 @ u)
        u = _l2normalize(w32.T @ v)
        if not self.is_initializing() and self.is_mutable_collection("spectral"):
            u_var.value, v_var.value = u, v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        # sigma keeps the gradient path through w (u, v are constants),
        # matching torch where u/v are requires_grad=False parameters.
        sigma = jnp.einsum("w,wo,o->", v, w_mat.astype(jnp.float32), u)
        return (w / sigma.astype(w.dtype)).reshape(w.shape)


# ---------------------------------------------------------------------------
# Conv / Linear layers
# ---------------------------------------------------------------------------

class Conv2d(nn.Module, _SpectralMixin):
    """Conv2d with torch-default bias/padding semantics and optional spectral
    norm (the reference wraps nearly every Stack-A conv in SpectralNorm)."""

    features: int
    kernel_size: int | tuple[int, int] = 3
    stride: int = 1
    padding: int | tuple[int, int] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    use_spect: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, pack: int = 1,
        concat_with: Optional[jax.Array] = None,
        fuse_avgpool2: bool = False,
        return_weights: bool = False,
    ):
        """pack > 1 runs the SAME conv (same params) on a space-to-depth
        packed input (ops/packed.py): a 'same' stride-1 conv at the original
        resolution, executed on the MXU-friendly packed layout.

        concat_with: semantically conv(concat([x, concat_with], -1)) but
        computed as two convs summed — skip-connection concats (UNet Up)
        otherwise materialize in a layout the following conv cannot use,
        costing a full copy of the map.

        fuse_avgpool2: computes avg_pool2d(conv(x), 2) as ONE stride-2 conv
        with the (k+1)² kernel K'[u] = ¼·Σ_{δ∈{0,1}²} K[u-δ] — exact algebra
        (pooling commutes with the linear conv), skipping the full-resolution
        intermediate. Used by the encoder stem / downsampling ResBlocks
        (reference base_function.py:271-305 conv→AvgPool tails)."""
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        in_ch = x.shape[-1] // (pack * pack)
        if concat_with is not None:
            assert self.groups == 1
            in_ch += concat_with.shape[-1] // (pack * pack)
        w = self.param(
            "kernel", self.kernel_init, (*ks, in_ch // self.groups, self.features)
        )
        if self.use_spect:
            w = self._spectral_normalize(w, self.features)
        b = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        if return_weights:
            # effective (kernel, bias) for fused Pallas consumers — spectral
            # norm applied, compute dtype; parameters stay owned here
            return (w.astype(self.dtype),
                    b.astype(self.dtype) if b is not None else None)
        if fuse_avgpool2:
            assert pack == 1 and concat_with is None
            assert (self.stride, self.dilation, self.groups) == (1, 1, 1)
            kh, kw = ks
            p = self.padding if isinstance(self.padding, int) else self.padding[0]
            assert kh == kw and p == kh // 2, "fold assumes odd 'same' convs"
            wf = jnp.zeros((kh + 1, kw + 1, *w.shape[2:]), w.dtype)
            for dh in (0, 1):
                for dw in (0, 1):
                    wf = wf.at[dh : dh + kh, dw : dw + kw].add(w)
            return conv2d(
                x.astype(self.dtype), (0.25 * wf).astype(self.dtype),
                b.astype(self.dtype) if b is not None else None,
                stride=2, padding=p)
        if pack > 1:
            assert (self.stride, self.dilation, self.groups) == (1, 1, 1), (
                "packed conv supports stride/dilation/groups only == 1")
            from face_mask_inpaint_tpu.ops.packed import packed_conv3x3

            bd = b.astype(self.dtype) if b is not None else None
            if concat_with is not None:
                # packed form of the summed-convs concat: two packed convs
                # over the channel-split weights (UNet skip on the packed
                # 256² stages)
                c1 = x.shape[-1] // (pack * pack)
                wd = w.astype(self.dtype)
                return packed_conv3x3(
                    x.astype(self.dtype), wd[:, :, :c1], None, pack
                ) + packed_conv3x3(
                    concat_with.astype(self.dtype), wd[:, :, c1:], bd, pack)
            return packed_conv3x3(x.astype(self.dtype), w.astype(self.dtype),
                                  bd, pack)
        if concat_with is not None:
            c1 = x.shape[-1]
            wd = w.astype(self.dtype)
            y = conv2d(x.astype(self.dtype), wd[:, :, :c1], None,
                       stride=self.stride, padding=self.padding,
                       dilation=self.dilation)
            y = y + conv2d(concat_with.astype(self.dtype), wd[:, :, c1:],
                           b.astype(self.dtype) if b is not None else None,
                           stride=self.stride, padding=self.padding,
                           dilation=self.dilation)
            return y
        # FMI_PACKED_DX_CI3: tiny-ci 3x3 'same' convs (image stems: VGG
        # conv1_1, the discriminator's block0 — dX traced at 21.7 / 1.2
        # TF/s, ci=3 output lanes) compute their INPUT gradient via the
        # half-in packed stencil (ops/conv.py:conv2d_packed_dx). Execution
        # strategy only — identical math; default ON after the r3 on-chip
        # A/B (GAN train 68.35 vs 67.84 imgs/s on top of the sym backward).
        import os as _os

        pad = self.padding if isinstance(self.padding, int) else self.padding[0]
        if (_os.environ.get("FMI_PACKED_DX_CI3", "1") == "1"
                and in_ch <= 4 and ks == (3, 3) and pad == 1
                and (self.stride, self.dilation, self.groups) == (1, 1, 1)):
            from face_mask_inpaint_tpu.ops.conv import conv2d_packed_dx

            return conv2d_packed_dx(
                x.astype(self.dtype), w.astype(self.dtype),
                b.astype(self.dtype) if b is not None else None)
        return conv2d(
            x.astype(self.dtype),
            w.astype(self.dtype),
            b.astype(self.dtype) if b is not None else None,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )


class ConvTranspose2d(nn.Module, _SpectralMixin):
    """torch-semantics transposed conv with optional spectral norm.

    Used by ResBlockDecoder (base_function.py:308-364). Spectral norm in the
    reference reshapes the torch IOHW weight to (in, out*kh*kw); here the rows
    are the output axis of the HWIO tensor — sigma of a matrix equals sigma of
    its transpose, so dynamics match.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    use_spect: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, pack_in: int = 1, packed_out: bool = False,
        return_weights: bool = False,
    ):
        """packed_out runs the SAME transposed conv (same params) from a
        pack_in-packed input to a (2*pack_in)-packed output on the same block
        grid (ops/packed.py) — the decoder-tail execution strategy.

        return_weights returns the effective (kernel, bias) — spectral norm
        applied, compute dtype — instead of the conv result, so a caller can
        feed a fused kernel (ops/pallas/packed_convt.py) while this module
        keeps owning the parameters (checkpoint layout unchanged)."""
        in_ch = x.shape[-1] // (pack_in * pack_in)
        w = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, self.kernel_size, in_ch, self.features),
        )
        if self.use_spect:
            # torch matricizes ConvTranspose2d's IOHW weight with the IN
            # axis as rows ([in, out*k*k], external_function.py:30-41) — a
            # DIFFERENT unfolding than the conv case, with a different
            # sigma. Permute so our shared power iteration sees the same
            # matrix (rows<->cols transposed; sigma is transpose-invariant).
            w = jnp.transpose(
                self._spectral_normalize(
                    jnp.transpose(w, (0, 1, 3, 2)), in_ch),
                (0, 1, 3, 2))
        b = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        if return_weights:
            return (w.astype(self.dtype),
                    b.astype(self.dtype) if b is not None else None)
        if packed_out:
            assert (self.kernel_size, self.stride, self.padding,
                    self.output_padding) == (3, 2, 1, 1), (
                "packed convT supports k=3, s=2, p=1, op=1 only")
            from face_mask_inpaint_tpu.ops.packed import packed_conv_transpose2x

            return packed_conv_transpose2x(
                x.astype(self.dtype), w.astype(self.dtype),
                b.astype(self.dtype) if b is not None else None, pack_in)
        assert pack_in == 1, "unpacked output from packed input is unsupported"
        return conv_transpose2d(
            x.astype(self.dtype),
            w.astype(self.dtype),
            b.astype(self.dtype) if b is not None else None,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class Dense(nn.Module, _SpectralMixin):
    """Linear layer (kernel stored [in, out]) with optional spectral norm."""

    features: int
    use_bias: bool = True
    use_spect: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        w = self.param("kernel", self.kernel_init, (in_dim, self.features))
        if self.use_spect:
            w = self._spectral_normalize(w, self.features)
        b = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        y = x.astype(self.dtype) @ w.astype(self.dtype)
        if b is not None:
            y = y + b.astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# Normalization layers (base_function.py:41-51)
# ---------------------------------------------------------------------------

class BatchNorm2d(nn.Module):
    """torch BatchNorm2d(momentum=0.1, affine=True, eps=1e-5) over NHWC.

    Running stats live in the ``batch_stats`` collection; ``use_running_average``
    selects train vs eval behavior.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=1.0 - self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)


class InstanceNorm2d(nn.Module):
    """torch InstanceNorm2d(affine=True, eps=1e-5): per-sample, per-channel
    normalization over the spatial axes. Stateless (no running stats), which
    matches the reference's track_running_stats=False default.

    ``fuse_act`` ('LeakyReLU' | 'ReLU') fuses the following activation into
    the normalization — on TPU via the two-pass Pallas kernel
    (ops/pallas/norm_act.py), which streams the big decoder maps at the
    bandwidth floor instead of XLA's reduce + standalone-select fusions.
    """

    epsilon: float = 1e-5
    affine: bool = True
    fuse_act: Optional[str] = None
    act_slope: float = 0.1  # registry LeakyReLU slope (base_function.py:61)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pack: int = 1,
                 return_affine: bool = False):
        if return_affine:
            # the learned (scale, bias) for fused consumers that apply the
            # normalization themselves (ops/pallas/packed_convt.py prologues)
            c = x.shape[-1] // (pack * pack)
            if not self.affine:
                return None, None
            return (self.param("scale", nn.initializers.ones, (c,)),
                    self.param("bias", nn.initializers.zeros, (c,)))
        if pack > 1:
            from face_mask_inpaint_tpu.ops.packed import packed_instance_norm_act

            c = x.shape[-1] // (pack * pack)
            scale = bias = None
            if self.affine:
                scale = self.param("scale", nn.initializers.ones, (c,))
                bias = self.param("bias", nn.initializers.zeros, (c,))
            return packed_instance_norm_act(
                x, scale, bias, pack, self.fuse_act or "none",
                self.act_slope, self.epsilon)
        if self.fuse_act is not None and self.affine:
            from face_mask_inpaint_tpu.ops.pallas import norm_act as na

            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            # Measured on v5e: XLA's own reduce+select fusion of this pattern
            # beats the two-pass Pallas kernel (112.9 vs 93.5 imgs/s on the
            # flagship) — Mosaic's per-op temp accounting forces tiny tiles.
            # The kernel stays available via norm_act.set_impl("pallas").
            fn = (
                na.instance_norm_act
                if na.use_pallas()
                else na.instance_norm_act_reference
            )
            return fn(x, scale, bias, self.fuse_act, self.act_slope, self.epsilon)

        # stats in f32: bf16 accumulation over ~1M-pixel maps loses precision.
        # E[x^2]-mu^2 instead of jnp.var: both reductions fuse into ONE read
        # of the map (jnp.var depends on the mean and forces a second pass —
        # measured 2x elementwise traffic on the 256^2 decoder stages).
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        y = ((x32 - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
        if self.fuse_act == "LeakyReLU":
            y = jax.nn.leaky_relu(y, self.act_slope)
        elif self.fuse_act == "ReLU":
            y = jax.nn.relu(y)
        return y


def make_norm(norm_type: str, name: str, train: bool = True) -> Optional[Callable]:
    """Norm registry matching get_norm_layer (base_function.py:41-51).

    Returns a callable layer or None for 'none'.
    """
    if norm_type == "batch":
        return BatchNorm2d(use_running_average=not train, name=name)
    if norm_type == "instance":
        return InstanceNorm2d(name=name)
    if norm_type == "none":
        return None
    raise NotImplementedError(f"normalization layer [{norm_type}] is not found")

# Known divergence: flax BatchNorm accumulates the *biased* batch variance
# into running stats, torch the unbiased (n/(n-1)) one — sub-0.1% difference
# at trainer batch sizes, covered by test tolerances (tests/test_nn_layers.py).
