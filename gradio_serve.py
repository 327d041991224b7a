#!/usr/bin/env python
"""Serving demo — ModelInterface + web UI.

Rebuild of reference gradio_serve.py: preprocess (256 BICUBIC resize,
normalize to [-1, 1]), infer (mask detect on (src+1)/2 -> pSp with
randomize_noise=False -> unnormalize -> rescale to the original size ->
uint8), two-image interface.

gradio is optional in this image; when absent, ``--selftest`` runs one
inference through the exact serving path and exits, and the module still
exposes ModelInterface for programmatic serving. The jitted inference path is
compiled once and reused across requests (the TPU serving fast path).
"""

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.models.unet import MaskDetector
from face_mask_inpaint_tpu.ops.resize import scale_img


class ModelInterface:
    """gradio_serve.py:14-77 — preprocess / infer / postprocess."""

    def __init__(self, args):
        self.args = args
        self.mask_detector = MaskDetector(n_channels=3, bilinear=True)
        self.generator = PSP(
            encoder_type=args.encoder_type, output_size=args.output_size,
            start_from_latent_avg=bool(args.start_from_latent_avg),
            learn_in_w=bool(args.learn_in_w),
            use_attention=bool(args.use_attention))

        src0 = jnp.zeros((1, 256, 256, 3))
        from PICNet_inference import load_mask_detector_vars
        from psp_inference import load_psp_vars
        self.md_vars = load_mask_detector_vars(
            self.mask_detector, args.mask_detector_path, src0)
        self.g_vars = load_psp_vars(
            self.generator, args, (src0,),
            dict(ref=src0, src_mask=jnp.zeros((1, 256, 256)), train=False))

        split = (jax.devices()[0].platform == 'axon'
                 and args.encoder_type == 'GradualStyleEncoder')
        if split:
            # several small programs: the fused graph stalls remote AOT
            # compile helpers (see psp_inference --split_jit / ROUND2_NOTES)
            mdf = jax.jit(lambda v, s: self.mask_detector.apply(
                v, (s + 1) / 2, method=MaskDetector.predict_mask))
            taps = jax.jit(lambda v, img: self.generator.apply(
                v, img, train=False, method=PSP.encode_taps))
            pyramid = jax.jit(lambda v, st, rt, m: self.generator.apply(
                v, st, rt, m, train=False, method=PSP.encode_pyramid))
            levels = [jax.jit(lambda v, x, _l=lvl: self.generator.apply(
                v, _l, x, method=PSP.encode_styles_level))
                for lvl in range(3)]
            dec = jax.jit(lambda v, c0, c1, c2: self.generator.apply(
                v, method=lambda m, a, b, c: m.decode(
                    m.finalize_codes(a, b, c), resize=True,
                    randomize_noise=False), a=c0, b=c1, c=c2))

            def _infer(src_img, ref_img):
                src_mask = mdf(self.md_vars, src_img)
                c3, p2, p1 = pyramid(
                    self.g_vars, taps(self.g_vars, src_img),
                    taps(self.g_vars, ref_img), src_mask)
                gen = dec(self.g_vars, levels[0](self.g_vars, c3),
                          levels[1](self.g_vars, p2),
                          levels[2](self.g_vars, p1))
                return gen, src_mask
        else:
            @jax.jit
            def _infer(src_img, ref_img):
                src_mask = self.mask_detector.apply(
                    self.md_vars, (src_img + 1) / 2,
                    method=MaskDetector.predict_mask)
                gen = self.generator.apply(
                    self.g_vars, src_img, ref=ref_img, src_mask=src_mask,
                    resize=True, randomize_noise=False, train=False,
                    rngs={'noise': jax.random.PRNGKey(0)})
                return gen, src_mask

        self._infer = _infer

    def preprocess_img(self, img: Image.Image):
        org_size = (img.size[1], img.size[0])
        img = img.resize((256, 256), resample=Image.BICUBIC)
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[..., None]
        arr = arr / 255.0
        arr = (arr - 0.5) / 0.5
        return jnp.asarray(arr, jnp.float32)[None], org_size

    @staticmethod
    def tensor2im(img_hwc: np.ndarray) -> np.ndarray:
        img = np.asarray(img_hwc, np.float32).copy()
        img[img < 0] = 0
        img[img > 1] = 1
        return (img * 255).astype('uint8')

    def infer(self, src_img: Image.Image, ref_img: Image.Image):
        src, src_size = self.preprocess_img(src_img)
        ref, _ = self.preprocess_img(ref_img)
        gen, mask = self._infer(src, ref)
        gen = (gen + 1) / 2
        gen = scale_img(gen, src_size)
        mask3 = jnp.repeat(mask[..., None], 3, axis=-1)
        mask3 = scale_img(mask3, src_size)
        return self.tensor2im(np.asarray(gen[0])), self.tensor2im(np.asarray(mask3[0]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--pt_ckpt_path',
                        default='saved_model/RefpSp_train_decoder/G_checkpoint_epoch5.pth',
                        type=str, help='Path to pretrained pSp model checkpoint')
    parser.add_argument('--mask_detector_path',
                        default='saved_model/new_mask_detector.pth', type=str,
                        help='Path to pretrained mask detector checkpoint')
    parser.add_argument('--use_attention', default=0, type=int, help='use attention')

    # pSp args: DO NOT MODIFY
    parser.add_argument('--use_ref', default=1, type=int, help='use reference image')
    parser.add_argument('--encoder_type', type=str, default='GradualStyleEncoder')
    parser.add_argument('--output_size', default=1024, type=int,
                        help='Output size of generator')
    parser.add_argument('--train_decoder', default=0, type=int,
                        help='Whether to train the decoder model')
    parser.add_argument('--start_from_latent_avg', type=int, default=1,
                        help='Whether to add average latent vector')
    parser.add_argument('--learn_in_w', type=int, default=0,
                        help='Whether to learn in w space instead of w+')
    parser.add_argument('--stylegan_weights', default=None, type=str,
                        help='Path to StyleGAN model weights')
    parser.add_argument('--selftest', action='store_true',
                        help='run one inference through the serving path and exit')
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format='%(levelname)s: %(message)s')

    model = ModelInterface(args)

    if args.selftest:
        rng = np.random.RandomState(0)
        src = Image.fromarray(rng.randint(0, 255, (300, 260, 3), dtype=np.uint8))
        ref = Image.fromarray(rng.randint(0, 255, (300, 260, 3), dtype=np.uint8))
        gen, mask = model.infer(src, ref)
        print('selftest ok:', gen.shape, gen.dtype, mask.shape)
        return

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            'gradio is not installed in this image; use --selftest or call '
            'ModelInterface.infer programmatically')

    iface = gr.Interface(
        fn=model.infer,
        inputs=[gr.Image(image_mode="RGB", type="pil", label="Image with mask"),
                gr.Image(image_mode="RGB", type="pil",
                         label="Image of the same person")],
        outputs=[gr.Image(label="Unmasked Image"), gr.Image(label="Mask Region")],
        title='Remove Facial Mask Demo')
    iface.launch(share=True)


if __name__ == '__main__':
    main()
