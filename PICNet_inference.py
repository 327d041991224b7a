#!/usr/bin/env python
"""Stack A (ReferenceFill) inference harness on TPU.

Flag-for-flag rebuild of reference PICNet_inference.py: mask from the frozen
UNet detector (mode='train' + argmax, :100-101), ReferenceFill generation
(no_prior for --old_model with 218x178 rescale), per-batch SSIM/MS-SSIM vs
raw GT, outputs test_results/<run_name>/gen_<id>.jpg (+ mask_<id>.jpg) and
metrics.csv with the dataset means.

Checkpoints: --pt_ckpt_path / --mask_detector_path accept either an orbax
directory produced by the TPU trainers, or a torch .pth (converted through
tools/convert_torch.py).
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
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.models.unet import MaskDetector
from face_mask_inpaint_tpu.ops.resize import scale_img
from face_mask_inpaint_tpu.train import checkpoint as ckpt
from face_mask_inpaint_tpu.utils.images import mask2im, tensor2im


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_root', type=str, default='/data/mohaa/project1/CelebA')
    parser.add_argument('--src_img_path', type=str, default='img_align_celeba_masked1')
    parser.add_argument('--ref_img_path', type=str, default='img_align_celeba')
    parser.add_argument('--mask_path', type=str, default='binary_map')
    parser.add_argument('--identity_file_path', type=str, default='identity_CelebA.txt')
    parser.add_argument('--use_best_reference', type=int, default=0)
    parser.add_argument('--mask_detector_path', type=str,
                        default='saved_model/mask_detector.pth')
    parser.add_argument('--batch_size', default=8, type=int)
    parser.add_argument('--pt_ckpt_path',
                        default='pretrained_models/psp_ffhq_encode.pt', type=str,
                        help='Path to pretrained model checkpoint')
    parser.add_argument('--img_scale', type=float, default=1.)
    parser.add_argument('--save_src_mask', type=int, default=0)

    # encoder args
    parser.add_argument('--encoder_type', type=str, default='pluralistic',
                        choices=['pluralistic', 'drn'])
    parser.add_argument('--encoder_ngf', type=int, default=32, help='base filters')
    parser.add_argument('--encoder_z_nc', type=int, default=128, help='z_nc')
    parser.add_argument('--encoder_img_f', type=int, default=128, help='final filters')
    parser.add_argument('--encoder_layers', type=int, default=5)
    parser.add_argument('--encoder_norm', type=str, default='none')
    parser.add_argument('--encoder_activation', type=str, default='LeakyReLU')
    parser.add_argument('--encoder_init_type', type=str, default='orthogonal')

    # decoder args
    parser.add_argument('--decoder_ngf', type=int, default=32, help='base filters')
    parser.add_argument('--decoder_z_nc', type=int, default=128, help='z_nc')
    parser.add_argument('--decoder_img_f', type=int, default=128, help='final filters')
    parser.add_argument('--decoder_L', type=int, default=0, help='z layers')
    parser.add_argument('--decoder_layers', type=int, default=5)
    parser.add_argument('--decoder_norm', type=str, default='instance')
    parser.add_argument('--decoder_activation', type=str, default='LeakyReLU')
    parser.add_argument('--decoder_init_type', type=str, default='orthogonal')

    parser.add_argument('--use_att', type=int, default=1, help='whether to use attention')
    parser.add_argument('--old_model', type=int, default=0)
    # TPU-rebuild extra: the reference hard-codes 256; data size must match
    parser.add_argument('--out_size', type=int, default=256)
    from face_mask_inpaint_tpu.utils.profiling import add_profile_args
    add_profile_args(parser)
    args = parser.parse_args()

    args.src_img_path = os.path.join(args.data_root, args.src_img_path)
    args.ref_img_path = os.path.join(args.data_root, args.ref_img_path)
    args.mask_path = os.path.join(args.data_root, args.mask_path)
    args.identity_file_path = os.path.join(args.data_root, args.identity_file_path)
    return args


def process_params(args):
    kwargs = vars(args)
    encoder_params = {k.replace('encoder_', ''): v for k, v in kwargs.items()
                      if k.startswith('encoder')}
    decoder_params = {k.replace('decoder_', ''): v for k, v in kwargs.items()
                      if k.startswith('decoder')}
    return encoder_params, decoder_params


def load_mask_detector_vars(model, path, sample):
    variables = model.init(jax.random.PRNGKey(0), sample)
    if not path:
        return variables
    if str(path).endswith(('.pth', '.pt')):
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_unet, load_torch_state_dict)
        conv = convert_unet(load_torch_state_dict(path))
        return jax.tree.map(jnp.asarray, conv)
    if Path(path).exists():
        return ckpt.restore_module_variables(path, variables)
    logging.warning('mask detector checkpoint %s not found; using random init', path)
    return variables


def load_generator_vars(model, path, init_args):
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sample': jax.random.PRNGKey(0)}, *init_args)
    if path and Path(path).exists() and not str(path).endswith(('.pth', '.pt')):
        return ckpt.restore_module_variables(path, variables)
    if path and str(path).endswith(('.pth', '.pt')) and Path(path).is_file():
        logging.info('Converting torch ReferenceFill checkpoint %s', path)
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_picnet_module, load_torch_state_dict)
        conv = convert_picnet_module(load_torch_state_dict(path))
        # strict=False semantics (PICNet_inference.py:155): merge what matches
        import flax.traverse_util as tu
        flat = tu.flatten_dict(variables['params'])
        conv_flat = tu.flatten_dict(conv['params'])
        merged = 0
        for k, v in conv_flat.items():
            if k in flat and flat[k].shape == tuple(v.shape):
                flat[k] = jnp.asarray(v)
                merged += 1
        logging.info('Merged %d/%d converted tensors', merged, len(flat))
        variables = {**variables, 'params': tu.unflatten_dict(flat)}
        return variables
    logging.warning('generator checkpoint %s not found; using random init', path)
    return variables


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format='%(levelname)s: %(message)s')
    logging.info('Using devices %s', jax.devices())

    encoder_params, decoder_params = process_params(args)
    out_size = (218, 178) if args.old_model else (args.out_size, args.out_size)
    generator = ReferenceFill(encoder_params=encoder_params,
                              decoder_params=decoder_params,
                              use_att=bool(args.use_att), out_size=out_size)
    mask_detector = MaskDetector(n_channels=3, bilinear=True)

    dataset = ReferenceDataset(args.src_img_path, args.ref_img_path,
                               args.mask_path, args.identity_file_path,
                               apply_transform=False, scale=args.img_scale,
                               use_ssim=bool(args.use_best_reference),
                               return_id=True)
    test_loader = DataLoader(dataset, args.batch_size, shuffle=False,
                             drop_last=False, num_workers=4, pad_last=True)

    sample = dataset[0]
    src0 = jnp.zeros((1, *sample['src_img'].shape))
    md_vars = load_mask_detector_vars(mask_detector, args.mask_detector_path, src0)
    in_hw = ((218, 178) if args.old_model else sample['src_img'].shape[:2])
    init_src = jnp.zeros((1, *in_hw, 3))
    g_vars = load_generator_vars(generator, args.pt_ckpt_path,
                                 (init_src, init_src, jnp.zeros((1, *in_hw))))

    @jax.jit
    def infer_batch(src_img, ref_img, rng):
        src_mask = mask_detector.apply(md_vars, src_img,
                                       method=MaskDetector.predict_mask)
        if args.old_model:
            src_img = scale_img(src_img, (218, 178))
            ref_img = scale_img(ref_img, (218, 178))
            src_mask = scale_img(src_mask[..., None], (218, 178))[..., 0]
        gen = generator.apply(g_vars, src_img, ref_img, src_mask,
                              no_prior=bool(args.old_model), train=False,
                              rngs={'sample': rng})
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
        if args.old_model:
            gt = scale_img(gt, (218, 178))
        s = float(ssim_fn(gt, gen))
        ms = float(ms_ssim_fn(gt, gen)) if gen.shape[1] > 160 else float('nan')
        eval_results.append([s, ms])

        gen_np = np.asarray(gen)
        mask_np = np.asarray(src_mask)
        ids = np.asarray(batch['id'])[:, 0].tolist()
        n_real = int(valid.sum()) if valid is not None else len(ids)
        for i in range(n_real):
            tensor2im(gen_np[i]).save(out_dir / f'gen_{ids[i]}.jpg')
            if args.save_src_mask:
                mask2im(mask_np[i]).save(out_dir / f'mask_{ids[i]}.jpg')

    eval_results = np.array(eval_results).mean(0)
    profiler.close()
    df = pd.DataFrame({'ssim': [eval_results[0]], 'ms_ssim': [eval_results[1]]})
    print(df)
    df.to_csv(out_dir / 'metrics.csv', index=False)


if __name__ == '__main__':
    main()
