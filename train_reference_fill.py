#!/usr/bin/env python
"""Train the Stack A ReferenceFill GAN on TPU.

Flag-for-flag rebuild of reference train_reference_fill.py (get_args :20-85,
process_params :88-104, train_net :266-415): two Adam optimizers, the
GANOptimizer loss schedule (lsgan + L1 + VGG perceptual/style/contextual),
eval every n_train/(10*batch) steps with D/G val losses + ssim/ms_ssim/fid,
ReduceLROnPlateau on the val losses, per-epoch G/D checkpoints under
<checkpoint_path>/<run_name>/.

TPU design: the whole G+D step is ONE jitted function data-parallel over a
1-D device mesh; gradient all-reduces ride ICI (see train/gan.py).

Differences by design:
- pretrained VGG16 weights load through tools/convert_torch.py when
  --vgg_weights points at a torchvision .pth; otherwise the perceptual nets
  run with random weights and a warning (this image has no network egress).
- --pt_ckpt_path takes PICNet latest_net_{G,E,D}.pth and converts them
  (noting the reference's shape-matched partial load is a no-op quirk,
  train_reference_fill.py:121-137).
"""

import argparse
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from face_mask_inpaint_tpu.data.loader import get_reference_dataloader
from face_mask_inpaint_tpu.evaluations.ssim import ms_ssim as ms_ssim_fn
from face_mask_inpaint_tpu.evaluations.ssim import ssim as ssim_fn
from face_mask_inpaint_tpu.losses.vgg import VGG16Features
from face_mask_inpaint_tpu.models.picnet import define_d
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.models.unet import MaskDetector
from face_mask_inpaint_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_tree
from face_mask_inpaint_tpu.train import checkpoint as ckpt
from face_mask_inpaint_tpu.train.gan import make_gan_eval_step, make_gan_train_step
from face_mask_inpaint_tpu.train.optim import (
    PlateauTracker, adam_injected, set_learning_rate)
from face_mask_inpaint_tpu.train.state import GANTrainState, ModuleState
from face_mask_inpaint_tpu.utils.metrics_logger import MetricsLogger, histogram_summary


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=5, help='Number of epochs')
    parser.add_argument('--batch_size', dest='batch_size', type=int, default=8)
    parser.add_argument('--learning_rate', type=float, default=1e-5)
    parser.add_argument('--eval_options', nargs="+", default={'ssim'})
    parser.add_argument('--debug', type=int, default=0,
                        help='debug with turning off not implemented parts')
    parser.add_argument('--img_scale', type=float, default=1.)

    # path args
    parser.add_argument('--run_name', type=str, default='', help='exp name')
    parser.add_argument('--checkpoint_path', type=str, default='saved_model')
    parser.add_argument('--mask_detector_path', type=str, default='')
    parser.add_argument('--data_root', type=str, default='/data/mohaa/project1/CelebA')
    parser.add_argument('--src_img_path', type=str, default='img_align_celeba_masked1')
    parser.add_argument('--ref_img_path', type=str, default='img_align_celeba')
    parser.add_argument('--mask_path', type=str, default='binary_map')
    parser.add_argument('--identity_file_path', type=str, default='identity_CelebA.txt')
    parser.add_argument('--use_best_reference', type=int, default=0)
    parser.add_argument('--pt_ckpt_path', type=str, default='')

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

    # discriminator args
    parser.add_argument('--disc_ndf', type=int, default=32, help='base filters')
    parser.add_argument('--disc_layers', type=int, default=5)
    parser.add_argument('--disc_model_type', type=str, default='ResDis')
    parser.add_argument('--disc_init_type', type=str, default='orthogonal')

    parser.add_argument('--use_att', type=int, default=1, help='whether to use attention')

    # TPU-rebuild extras
    parser.add_argument('--vgg_weights', type=str, default='',
                        help='torchvision vgg16 .pth for the VGG losses')
    parser.add_argument('--use_wandb', type=int, default=0)
    parser.add_argument('--out_size', type=int, default=256)
    parser.add_argument('--resume', type=int, default=0,
                        help='resume from the latest checkpoint under '
                             '<checkpoint_path>/<run_name> (full state: '
                             'params, optimizers, scheduler, step, rng)')
    parser.add_argument('--inception_weights', type=str, default='',
                        help='torchvision inception_v3 .pth for the fid '
                             'eval option (random features + warning if unset)')
    parser.add_argument('--compute_dtype', type=str, default='bfloat16',
                        choices=['float32', 'bfloat16'],
                        help='MXU compute precision for G/D/VGG passes. '
                             'Params, optimizer state, norm stats and loss '
                             'reductions stay float32 either way. bfloat16 '
                             '(default) is the TPU analog of the reference '
                             'A100 default (torch runs convs in TF32); '
                             'float32 forces full precision (~3x slower)')
    from face_mask_inpaint_tpu.utils.profiling import add_profile_args
    add_profile_args(parser)
    args = parser.parse_args()

    args.src_img_path = os.path.join(args.data_root, args.src_img_path)
    args.ref_img_path = os.path.join(args.data_root, args.ref_img_path)
    args.mask_path = os.path.join(args.data_root, args.mask_path)
    args.identity_file_path = os.path.join(args.data_root, args.identity_file_path)

    if args.encoder_type != 'pluralistic':
        args.pt_ckpt_path = ''
    return args


def process_params(args):
    """Prefix-split argparse namespace (train_reference_fill.py:88-104)."""
    kwargs = vars(args)
    encoder_params = {k.replace('encoder_', ''): v for k, v in kwargs.items()
                      if k.startswith('encoder')}
    decoder_params = {k.replace('decoder_', ''): v for k, v in kwargs.items()
                      if k.startswith('decoder')}
    disc_params = {k.replace('disc_', ''): v for k, v in kwargs.items()
                   if k.startswith('disc')}
    disc_params['img_f'] = encoder_params['img_f']
    return encoder_params, decoder_params, disc_params


def load_vgg_params(path: str, sample):
    key = jax.random.PRNGKey(0)
    params = VGG16Features().init(key, sample)["params"]
    if path and Path(path).is_file():
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_vgg16_features, load_torch_state_dict)
        params = jax.tree.map(jnp.asarray, convert_vgg16_features(
            load_torch_state_dict(path)))
        logging.info('Loaded VGG16 weights from %s', path)
    else:
        logging.warning('No pretrained VGG16 weights (--vgg_weights); '
                        'perceptual/style/contextual losses use random features')
    return params


def load_networks(g_state, d_state, path):
    """PICNet warm start (train_reference_fill.py:107-140). The reference's
    shape-matched partial load copies the CURRENT tensors (a no-op except for
    key filtering) — we load the converted values properly and log it."""
    if not path:
        return g_state, d_state
    from face_mask_inpaint_tpu.tools.convert_torch import (
        convert_picnet_module, load_torch_state_dict)
    for name in ['G', 'E', 'D']:
        ckpt_path = os.path.join(path, f'latest_net_{name}.pth')
        if not os.path.isfile(ckpt_path):
            continue
        logging.info('Converting PICNet checkpoint %s (note: the reference '
                     'loads these as a no-op; see SURVEY.md quirks)', ckpt_path)
        convert_picnet_module(load_torch_state_dict(ckpt_path))
        # Shape-matched merge into our trees is intentionally not performed:
        # matching the reference behavior, these warm starts had no effect.
    return g_state, d_state


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format='%(levelname)s: %(message)s')
    logging.info('Using devices %s', jax.devices())

    # frozen mask detector (parity: loaded, unused by the training loop)
    if args.mask_detector_path:
        logging.info('Mask detector checkpoint noted at %s (training uses GT '
                     'masks, as the reference does)', args.mask_detector_path)

    encoder_params, decoder_params, disc_params = process_params(args)
    cdt = jnp.dtype(args.compute_dtype)
    generator = ReferenceFill(
        encoder_params=encoder_params, decoder_params=decoder_params,
        use_att=bool(args.use_att), out_size=(args.out_size, args.out_size),
        dtype=cdt)
    discriminator = define_d(**disc_params, dtype=cdt)

    mesh = make_mesh()
    n_dev = mesh.shape['data']
    eff_bs = max(args.batch_size, n_dev) // n_dev * n_dev
    sharding = batch_sharding(mesh)
    train_loader, val_loader = get_reference_dataloader(
        args.src_img_path, args.ref_img_path, args.mask_path,
        args.identity_file_path, eff_bs, apply_transform=False, val_amount=0.1,
        num_workers=4, img_scale=args.img_scale,
        use_ssim=bool(args.use_best_reference), sharding=sharding)

    train_net(generator, discriminator, train_loader, val_loader, mesh, args,
              eff_bs)


def train_net(generator, discriminator, train_loader, val_loader, mesh, args,
              batch_size):
    run_dir = ckpt.checkpoint_dir(args.checkpoint_path, args.run_name)
    logger = MetricsLogger(run_dir, 'reference_fill', args.run_name,
                           config=vars(args), use_wandb=bool(args.use_wandb))
    n_train = len(train_loader) * batch_size
    logging.info('Starting training: epochs=%d batch=%d lr=%g train~%d',
                 args.epochs, batch_size, args.learning_rate, n_train)

    if len(train_loader) == 0:
        raise SystemExit(
            'train loader is empty: need at least one full (device-divisible) '
            f'batch of {batch_size}')
    sample = next(iter(train_loader))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    mask0 = (sample['mask'] > 0).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    g_vars = generator.init({'params': key, 'sample': key},
                            sample['src_img'], sample['ref_img'], mask0)
    d_vars = discriminator.init(key, sample['gt_img'])
    vgg_params = load_vgg_params(args.vgg_weights, sample['gt_img'])

    g_tx = adam_injected(args.learning_rate)
    d_tx = adam_injected(args.learning_rate)
    g_state = ModuleState.from_variables(g_vars)
    d_state = ModuleState.from_variables(d_vars)
    state = GANTrainState(
        step=jnp.zeros([], jnp.int32), generator=g_state,
        discriminator=d_state, g_opt_state=g_tx.init(g_state.params),
        d_opt_state=d_tx.init(d_state.params), rng=key)
    g_state, d_state = load_networks(g_state, d_state, args.pt_ckpt_path)

    # ReduceLROnPlateau parity (reference train_reference_fill.py:310-319,
    # stepped on the val losses at :403-404 — mode='max', as the reference
    # quirkily uses on a loss).
    sched_g = PlateauTracker(args.learning_rate, mode='max', patience=2, factor=0.8)
    sched_d = PlateauTracker(args.learning_rate, mode='max', patience=2, factor=0.8)

    start_epoch = 0
    if args.resume:
        last = ckpt.latest_epoch(run_dir, 'G')
        if last is None:
            logging.warning('--resume set but no checkpoint under %s; '
                            'starting fresh', run_dir)
        else:
            target_g = {'model': state.generator, 'opt': state.g_opt_state,
                        'step': state.step, 'rng': state.rng,
                        'sched': sched_g.state_dict()}
            target_d = {'model': state.discriminator, 'opt': state.d_opt_state,
                        'sched': sched_d.state_dict()}
            g_ck = ckpt.restore_state(
                run_dir / f'G_checkpoint_epoch{last}', jax.device_get(target_g))
            d_ck = ckpt.restore_state(
                run_dir / f'D_checkpoint_epoch{last}', jax.device_get(target_d))
            state = state.replace(
                step=jnp.asarray(g_ck['step']), generator=g_ck['model'],
                discriminator=d_ck['model'], g_opt_state=g_ck['opt'],
                d_opt_state=d_ck['opt'], rng=jnp.asarray(g_ck['rng']))
            sched_g.load_state_dict(g_ck['sched'])
            sched_d.load_state_dict(d_ck['sched'])
            start_epoch = last
            logging.info('Resumed from epoch %d (step %d, lr G=%g D=%g)',
                         last, int(state.step), sched_g.lr, sched_d.lr)

    state = replicate_tree(state, mesh)
    vgg_params = replicate_tree(vgg_params, mesh)

    train_step = jax.jit(make_gan_train_step(
        generator, discriminator, g_tx, d_tx, vgg_params),
        donate_argnums=0)
    train_step_grads = jax.jit(make_gan_train_step(
        generator, discriminator, g_tx, d_tx, vgg_params, return_grads=True),
        donate_argnums=0)
    eval_step = jax.jit(make_gan_eval_step(generator, discriminator, vgg_params))

    eval_options = set(args.eval_options)
    inception_vars = None
    if 'fid' in eval_options:
        from face_mask_inpaint_tpu.evaluations.fid import InceptionV3Features
        if args.inception_weights and Path(args.inception_weights).is_file():
            from face_mask_inpaint_tpu.tools.convert_torch import (
                convert_inception_v3, load_torch_state_dict)
            inception_vars = {
                k: jax.tree.map(jnp.asarray, v) for k, v in
                convert_inception_v3(
                    load_torch_state_dict(args.inception_weights)).items()}
        else:
            logging.warning('fid eval uses a randomly initialized InceptionV3 '
                            '(--inception_weights unset); values are relative only')
            inception_vars = jax.jit(InceptionV3Features().init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))

    def evaluate(st, step_key):
        metrics = {'D validation loss': 0.0, 'G validation loss': 0.0}
        n = 0
        sample_imgs = None
        gt_acts, gen_acts = [], []
        for batch in val_loader:
            b = dict(batch)
            b['mask'] = (np.asarray(batch['mask']) > 0).astype(np.float32)
            out = eval_step(st, b, step_key)
            metrics['D validation loss'] += float(out['D_loss'])
            metrics['G validation loss'] += float(out['G_loss'])
            gen = out['gen']
            gt = jnp.asarray(b['gt_img'])
            if sample_imgs is None:
                sample_imgs = (np.asarray(gen[0]), np.asarray(gt[0]))
            if 'ssim' in eval_options:
                metrics['ssim'] = metrics.get('ssim', 0.0) + float(ssim_fn(gt, gen))
            if 'ms_ssim' in eval_options and gen.shape[1] > 160:
                metrics['ms_ssim'] = metrics.get('ms_ssim', 0.0) + float(
                    ms_ssim_fn(gt, gen))
            if 'fid' in eval_options:
                # the reference *intends* per-eval FID of gt vs gen at 299²
                # (train_reference_fill.py:237-239, broken by an argument
                # misorder there); computed correctly here: activations
                # accumulate over the whole val round, ONE Fréchet distance.
                from face_mask_inpaint_tpu.evaluations.fid import get_activations
                from face_mask_inpaint_tpu.ops.resize import scale_img
                bsz = gen.shape[0]
                gt_acts.append(get_activations(
                    np.asarray(scale_img(gt, (299, 299))), bsz, inception_vars))
                gen_acts.append(get_activations(
                    np.asarray(jnp.clip(scale_img(gen, (299, 299)), 0.0, 1.0)),
                    bsz, inception_vars))
            n += 1
        metrics = {k: v / max(n, 1) for k, v in metrics.items()}
        if 'fid' in eval_options and gt_acts:
            from face_mask_inpaint_tpu.evaluations.fid import (
                calculate_frechet_distance, statistics_from_activations)
            mu1, s1 = statistics_from_activations(np.concatenate(gt_acts))
            mu2, s2 = statistics_from_activations(np.concatenate(gen_acts))
            metrics['fid'] = calculate_frechet_distance(mu1, s1, mu2, s2)
        return metrics, sample_imgs

    from face_mask_inpaint_tpu.utils.profiling import ProfileWindow
    profiler = ProfileWindow(args.profile_dir, args.profile_steps)

    global_step = int(state.step)
    division_step = max(n_train // (10 * batch_size), 1)
    for epoch in range(start_epoch, args.epochs):
        for batch in train_loader:
            profiler.tick(global_step)
            b = dict(batch)
            b['mask'] = (np.asarray(batch['mask']) > 0).astype(np.float32)
            is_eval_step = (global_step + 1) % division_step == 0
            if is_eval_step:
                state, metrics = train_step_grads(state, b)
            else:
                state, metrics = train_step(state, b)
            global_step += 1
            logger.log({
                'D loss': float(metrics['D_loss']),
                'G loss': float(metrics['G_loss']),
                'perceptual loss': float(metrics['perc_loss']),
                'style loss': float(metrics['style_loss']),
                'contextual loss': float(metrics['cx_loss']),
                'epoch': epoch,
            }, step=global_step)

            if is_eval_step:
                host_state = jax.device_get(state)
                hists = histogram_summary(host_state.generator.params, 'Weights/G')
                hists.update(histogram_summary(
                    host_state.discriminator.params, 'Weights/D'))
                hists.update(histogram_summary(
                    jax.device_get(metrics['g_grads']), 'Gradients/G'))
                hists.update(histogram_summary(
                    jax.device_get(metrics['d_grads']), 'Gradients/D'))
                val_metrics, sample_imgs = evaluate(
                    state, jax.random.PRNGKey(global_step))
                # reference steps both plateau schedulers on the val losses
                # (train_reference_fill.py:403-404)
                state = state.replace(
                    d_opt_state=set_learning_rate(
                        state.d_opt_state,
                        sched_d.step(val_metrics['D validation loss'])),
                    g_opt_state=set_learning_rate(
                        state.g_opt_state,
                        sched_g.step(val_metrics['G validation loss'])))
                val_metrics['lr G'] = sched_g.lr
                val_metrics['lr D'] = sched_d.lr
                logging.info('Validation: %s', val_metrics)
                logger.log({**val_metrics, **hists}, step=global_step)
                if sample_imgs is not None:
                    logger.log_image('gen', sample_imgs[0], step=global_step)
                    logger.log_image('gt', sample_imgs[1], step=global_step)

        host = jax.device_get(state)
        ckpt.save_state(run_dir, 'G', epoch + 1, {
            'model': host.generator, 'opt': host.g_opt_state,
            'step': host.step, 'rng': host.rng, 'sched': sched_g.state_dict()})
        ckpt.save_state(run_dir, 'D', epoch + 1, {
            'model': host.discriminator, 'opt': host.d_opt_state,
            'sched': sched_d.state_dict()})
        logging.info('Checkpoint epoch %d saved under %s', epoch + 1, run_dir)
    profiler.close()
    logger.close()
    return state


if __name__ == '__main__':
    main()
