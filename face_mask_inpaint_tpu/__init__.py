"""face_mask_inpaint_tpu — a TPU-native framework for reference-guided facial
mask removal.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`syncdoth/face_mask_inpaint` (reference mounted at /root/reference):

- Stack A — "ReferenceFill": pluralistic-inpainting VAE-GAN encoder/decoder with
  example-guided cross attention, trained adversarially (LSGAN + VGG losses).
- Stack B — "RefpSp": pSp GradualStyleEncoder with reference fusion, decoding
  through a StyleGAN2 generator (modulated conv / upfirdn2d as TPU kernels).
- Stack C — UNet mask detector producing the binary face-covering mask.

Design principles (TPU-first, not a port):

- NHWC activations / HWIO conv kernels everywhere (XLA's native TPU layout).
- All resampling (bilinear align_corners, adaptive avg-pool) is expressed as
  small dense interpolation-matrix matmuls: exact PyTorch semantics, runs on
  the MXU instead of gather units.
- StyleGAN2's per-sample modulated conv is algebraically refactored to
  "scale input → one big conv → scale output" so the MXU sees a single large
  batched convolution instead of per-sample grouped weights.
- Stateful PyTorch idioms (spectral-norm power iteration, BatchNorm running
  stats, noise RNG, posterior sampling) become explicit functional state
  threaded through flax variable collections and JAX PRNG keys.
- Data parallelism is GSPMD: a 1-D `jax.sharding.Mesh` over the batch axis;
  XLA inserts the gradient all-reduces over ICI. See `parallel/`.
"""

__version__ = "0.1.0"
