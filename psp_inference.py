#!/usr/bin/env python
"""Stack B (pSp -> StyleGAN2) inference harness on TPU.

Flag-for-flag rebuild of reference psp_inference.py: data fixed at scale=0.25
/ apply_transform / best-SSIM references (:146-154); the mask detector sees
(src+1)/2 because inputs are normalized to [-1,1] (:92); outputs saved as
((gen+1)/2) uint8 with per-batch SSIM/MS-SSIM vs raw GT into
test_results/<run_name>/{gen_<id>.jpg, metrics.csv}.
"""

import argparse
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from face_mask_inpaint_tpu.data.dataset import ReferenceDataset
from face_mask_inpaint_tpu.data.loader import DataLoader
from face_mask_inpaint_tpu.evaluations.ssim import ms_ssim as ms_ssim_fn
from face_mask_inpaint_tpu.evaluations.ssim import ssim as ssim_fn
from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.models.unet import MaskDetector
from face_mask_inpaint_tpu.train import checkpoint as ckpt
from face_mask_inpaint_tpu.utils.images import mask2im, tensor2im_pm1


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_root', type=str, default='/data/mohaa/project1/CelebAHQ')
    parser.add_argument('--identity_file_path', type=str,
                        default='CelebA-HQ-identity.txt')
    parser.add_argument('--mask_path', type=str, default='binary_map')
    parser.add_argument('--src_img_path', type=str, default='images_masked_test')
    parser.add_argument('--ref_img_path', type=str, default='images')
    parser.add_argument('--mask_detector_path', type=str,
                        default='saved_model/mask_detector.pth')
    parser.add_argument('--batch_size', default=8, type=int)
    parser.add_argument('--pt_ckpt_path',
                        default='pretrained_models/psp_ffhq_encode.pt', type=str,
                        help='Path to pretrained pSp model checkpoint')
    parser.add_argument('--save_src_mask', type=int, default=0)

    # pSp args
    parser.add_argument('--use_ref', action='store_true', help='use reference image')
    parser.add_argument('--use_attention', default=0, type=int, help='use attention')
    parser.add_argument('--encoder_type', type=str, default='GradualStyleEncoder')
    parser.add_argument('--output_size', default=1024, type=int,
                        help='Output size of generator')
    parser.add_argument('--train_decoder', default=0, type=int,
                        help='Whether to train the decoder model')
    parser.add_argument('--start_from_latent_avg', action='store_true',
                        help='Whether to add average latent vector')
    parser.add_argument('--learn_in_w', action='store_true',
                        help='Whether to learn in w space instead of w+')
    parser.add_argument('--randomize_noise', action='store_true',
                        help='whether to randomize noise in stylegan')
    parser.add_argument('--stylegan_weights', default=None, type=str,
                        help='Path to StyleGAN model weights')
    from face_mask_inpaint_tpu.utils.profiling import add_profile_args
    add_profile_args(parser)
    parser.add_argument('--split_jit', default=-1, type=int,
                        help='1: jit the pSp pipeline as several small '
                             'programs (detector/backbone/pyramid/style '
                             'levels/decoder) instead of one fused graph; '
                             '-1 (auto) enables it on remote-compile '
                             'backends where the fused graph stalls the '
                             'AOT compiler')
    args = parser.parse_args()

    args.src_img_path = os.path.join(args.data_root, args.src_img_path)
    args.ref_img_path = os.path.join(args.data_root, args.ref_img_path)
    args.mask_path = os.path.join(args.data_root, args.mask_path)
    args.identity_file_path = os.path.join(args.data_root, args.identity_file_path)
    return args


def _psp_variables_skeleton(model, init_args, init_kwargs):
    """Variable tree with the right structure/shapes via eval_shape (pure
    tracing) + host-side fan-in-scaled fill. Real checkpoints overwrite
    every leaf; eager `model.init` of the full pSp dispatches thousands of
    ops (minutes through a remote-execution relay) and its jit stalls the
    remote AOT compiler (ROUND2_NOTES)."""
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(0)}
    shapes = jax.eval_shape(
        lambda: model.init(rngs, *init_args, **init_kwargs))
    fill = np.random.RandomState(0)
    import flax.traverse_util as tu

    def leaf(path, s):
        name = path[-1]
        if name in ("var", "scale"):  # BN running var / norm scales
            return jnp.ones(s.shape, s.dtype)
        if name in ("mean", "bias"):
            return jnp.zeros(s.shape, s.dtype)
        fan_in = int(np.prod(s.shape[:-1])) if len(s.shape) > 1 else 1
        return jnp.asarray(
            (fill.randn(*s.shape) / np.sqrt(max(fan_in, 1))).astype(s.dtype))

    flat = tu.flatten_dict(shapes)
    return tu.unflatten_dict({k: leaf(k, v) for k, v in flat.items()})


def load_psp_vars(model, args, init_args, init_kwargs):
    variables = _psp_variables_skeleton(model, init_args, init_kwargs)
    path = args.pt_ckpt_path
    if path and str(path).endswith(('.pth', '.pt')) and Path(path).is_file():
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_psp, load_torch_state_dict)
        logging.info('Loading pSp from checkpoint: %s', path)
        conv = convert_psp(load_torch_state_dict(path), args.output_size)
        import flax.traverse_util as tu
        flat = tu.flatten_dict(variables)
        conv_flat = tu.flatten_dict(conv)
        merged = 0
        for k, v in conv_flat.items():
            if k in flat and flat[k].shape == tuple(np.shape(v)):
                flat[k] = jnp.asarray(v)
                merged += 1
        logging.info('Merged %d/%d tensors from torch ckpt', merged, len(flat))
        return tu.unflatten_dict(flat)
    if path and Path(path).exists():
        return ckpt.restore_module_variables(path, variables)
    logging.warning('pSp checkpoint %s not found; using random init', path)
    return variables


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format='%(levelname)s: %(message)s')
    logging.info('Using devices %s', jax.devices())

    mask_detector = MaskDetector(n_channels=3, bilinear=True)
    generator = PSP(
        encoder_type=args.encoder_type, output_size=args.output_size,
        start_from_latent_avg=args.start_from_latent_avg,
        learn_in_w=args.learn_in_w, use_attention=bool(args.use_attention))

    dataset = ReferenceDataset(args.src_img_path, args.ref_img_path,
                               args.mask_path, args.identity_file_path,
                               apply_transform=True, scale=0.25, use_ssim=True,
                               return_id=True)
    test_loader = DataLoader(dataset, args.batch_size, shuffle=False,
                             drop_last=False, num_workers=4, pad_last=True)

    sample = dataset[0]
    hw = sample['src_img'].shape[:2]
    src0 = jnp.zeros((1, *hw, 3))
    from PICNet_inference import load_mask_detector_vars
    md_vars = load_mask_detector_vars(mask_detector, args.mask_detector_path, src0)
    init_kwargs = dict(ref=src0, src_mask=jnp.zeros((1, *hw)), train=False)
    g_vars = load_psp_vars(generator, args, (src0,), init_kwargs)

    use_split = (bool(args.split_jit) if args.split_jit >= 0
                 else jax.devices()[0].platform == 'axon')
    if use_split and args.encoder_type != 'GradualStyleEncoder':
        logging.warning(
            '--split_jit is only supported for encoder_type='
            'GradualStyleEncoder; falling back to the fused jit (may stall '
            'remote-compile backends)')
    if use_split and args.encoder_type == 'GradualStyleEncoder':
        # several small programs (params as args — closed-over trees embed
        # as constants and blow remote-compile request limits); the fused
        # graph stalls/crashes remote AOT compile helpers (ROUND2_NOTES)
        mdf = jax.jit(lambda v, s: mask_detector.apply(
            v, (s + 1) / 2, method=MaskDetector.predict_mask))
        taps = jax.jit(lambda v, img: generator.apply(
            v, img, train=False, method=PSP.encode_taps))
        pyramid = jax.jit(lambda v, st, rt, m: generator.apply(
            v, st, rt, m, train=False, method=PSP.encode_pyramid))
        levels = [jax.jit(lambda v, x, _l=lvl: generator.apply(
            v, _l, x, method=PSP.encode_styles_level)) for lvl in range(3)]
        dec = jax.jit(lambda v, c0, c1, c2: generator.apply(
            v, method=lambda m, a, b, c: m.decode(
                m.finalize_codes(a, b, c), resize=True,
                randomize_noise=False), a=c0, b=c1, c=c2))

        def infer_batch(src_img, ref_img, rng):
            del rng  # randomize_noise=False
            src_mask = mdf(md_vars, src_img)
            st = taps(g_vars, src_img)
            rt = taps(g_vars, ref_img) if args.use_ref else None
            c3, p2, p1 = pyramid(g_vars, st, rt,
                                 src_mask if args.use_ref else None)
            gen = dec(g_vars, levels[0](g_vars, c3), levels[1](g_vars, p2),
                      levels[2](g_vars, p1))
            return gen, src_mask
    else:
        @jax.jit
        def infer_batch(src_img, ref_img, rng):
            src_mask = mask_detector.apply(md_vars, (src_img + 1) / 2,
                                           method=MaskDetector.predict_mask)
            gen, _ = generator.apply(
                g_vars, src_img,
                ref=ref_img if args.use_ref else None,
                src_mask=src_mask if args.use_ref else None,
                return_latents=True, resize=True, randomize_noise=False,
                train=False, rngs={'noise': rng})
            return gen, src_mask

    run_name = os.path.split(os.path.split(str(args.pt_ckpt_path))[0])[1]
    out_dir = Path(f'test_results/{run_name}')
    out_dir.mkdir(parents=True, exist_ok=True)

    eval_results = []
    from face_mask_inpaint_tpu.utils.profiling import ProfileWindow
    profiler = ProfileWindow(args.profile_dir, args.profile_steps)
    rng = jax.random.PRNGKey(0)
    for step_i, batch in enumerate(test_loader):
        profiler.tick(step_i)
        rng, step_rng = jax.random.split(rng)
        valid = batch.get('_valid')
        gen, src_mask = infer_batch(jnp.asarray(batch['src_img']),
                                    jnp.asarray(batch['ref_img']), step_rng)
        gt = jnp.asarray(batch['raw_gt_img'])
        gen01 = (gen + 1) / 2
        s = float(ssim_fn(gt, gen01))
        ms = float(ms_ssim_fn(gt, gen01)) if gen.shape[1] > 160 else float('nan')
        eval_results.append([s, ms])

        gen_np = np.asarray(gen)
        mask_np = np.asarray(src_mask)
        ids = np.asarray(batch['id'])[:, 0].tolist()
        n_real = int(valid.sum()) if valid is not None else len(ids)
        for i in range(n_real):
            tensor2im_pm1(gen_np[i]).save(out_dir / f'gen_{ids[i]}.jpg')
            if args.save_src_mask:
                mask2im(mask_np[i]).save(out_dir / f'mask_{ids[i]}.jpg')

    eval_results = np.array(eval_results).mean(0)
    profiler.close()
    df = pd.DataFrame({'ssim': [eval_results[0]], 'ms_ssim': [eval_results[1]]})
    print(df)
    df.to_csv(out_dir / 'metrics.csv', index=False)


if __name__ == '__main__':
    main()
