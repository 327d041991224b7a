#!/usr/bin/env python
"""Offline metric CLI over a folder of generated images.

Rebuild of reference test_evaluate.py (self-described as deprecated there,
but it is the only place the reference computes a CORRECT dataset-level FID —
activations accumulated across the whole set, one Fréchet distance,
test_evaluate.py:96-116). Same surface: --test_folder of gen_<id>.jpg files,
GT at <data_root>/<gt_img_path>/<id>.jpg (scale 0.25), metrics.csv out.

FID requires converted InceptionV3 weights (--inception_weights, torchvision
.pth); without them the fid option is skipped with a warning (no network
egress in this image).
"""

import argparse
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from face_mask_inpaint_tpu.data.dataset import _load, _preprocess
from face_mask_inpaint_tpu.evaluations.fid import (
    InceptionV3Features,
    calculate_frechet_distance,
    get_activations,
)
from face_mask_inpaint_tpu.evaluations.ssim import ms_ssim as ms_ssim_fn
from face_mask_inpaint_tpu.evaluations.ssim import ssim as ssim_fn
from face_mask_inpaint_tpu.ops.resize import scale_img


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--eval_options', nargs="+", default=['ssim', 'ms_ssim', 'fid'])
    parser.add_argument('--batch_size', type=int, default=8)

    # path args
    parser.add_argument('--data_root', type=str, default='/data/mohaa/project1/CelebAHQ')
    parser.add_argument('--gt_img_path', type=str, default='images')
    parser.add_argument('--test_folder', type=str, default='')

    # additional args
    parser.add_argument('--specific_img', nargs="+", default={})

    # TPU-rebuild extras
    parser.add_argument('--inception_weights', type=str, default='',
                        help='torchvision inception_v3 .pth for FID')
    parser.add_argument('--gt_scale', type=float, default=0.25)

    args = parser.parse_args()
    args.gt_img_path = os.path.join(args.data_root, args.gt_img_path)
    return args


def load_images(args, test_id):
    gt = _preprocess(_load(Path(args.gt_img_path) / f'{test_id}.jpg'),
                     args.gt_scale, False)
    gen = _preprocess(_load(Path(args.test_folder) / f'gen_{test_id}.jpg'),
                      1.0, False)
    return gt, gen


def make_batch(test_ids, batch_size):
    for i in range(0, len(test_ids), batch_size):
        yield test_ids[i : i + batch_size]


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format='%(levelname)s: %(message)s')

    test_ids = [os.path.basename(x).split('.')[0].split('_')[1]
                for x in os.listdir(args.test_folder) if x.startswith('gen')]
    if args.specific_img:
        test_ids = list(args.specific_img)

    options = set(args.eval_options)
    inception_vars = None
    if 'fid' in options:
        if args.inception_weights and Path(args.inception_weights).is_file():
            from face_mask_inpaint_tpu.tools.convert_torch import (
                convert_inception_v3, load_torch_state_dict)
            inception_vars = convert_inception_v3(
                load_torch_state_dict(args.inception_weights))
            inception_vars = {k: jax.tree.map(jnp.asarray, v)
                              for k, v in inception_vars.items()}
        else:
            logging.warning('fid requested but no --inception_weights; skipping fid')
            options.discard('fid')

    eval_results = {k: 0.0 for k in options if k in ('ssim', 'ms_ssim')}
    gt_acts, gen_acts = [], []
    for batch_ids in make_batch(test_ids, args.batch_size):
        pairs = [load_images(args, bid) for bid in batch_ids]
        gt = jnp.stack([p[0] for p in pairs])
        gen = jnp.stack([p[1] for p in pairs])
        if 'ssim' in options:
            eval_results['ssim'] += float(ssim_fn(gt, gen)) * len(batch_ids)
        if 'ms_ssim' in options:
            eval_results['ms_ssim'] += float(ms_ssim_fn(gt, gen)) * len(batch_ids)
        if 'fid' in options:
            gt_acts.append(get_activations(
                np.asarray(scale_img(gt, (299, 299))), len(batch_ids), inception_vars))
            gen_acts.append(get_activations(
                np.asarray(scale_img(gen, (299, 299))), len(batch_ids), inception_vars))

    eval_results = {k: [v / len(test_ids)] for k, v in eval_results.items()}
    if 'fid' in options:
        gt_acts = np.concatenate(gt_acts, axis=0)
        gen_acts = np.concatenate(gen_acts, axis=0)
        mu1, s1 = np.mean(gt_acts, axis=0), np.cov(gt_acts, rowvar=False)
        mu2, s2 = np.mean(gen_acts, axis=0), np.cov(gen_acts, rowvar=False)
        eval_results['fid'] = [calculate_frechet_distance(mu1, s1, mu2, s2)]

    df = pd.DataFrame(eval_results)
    print(df)
    df.to_csv(os.path.join(args.test_folder, 'metrics.csv'), index=False)


if __name__ == '__main__':
    main()
