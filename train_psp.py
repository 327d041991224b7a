#!/usr/bin/env python
"""Train the Stack B RefpSp (pSp encoder -> StyleGAN2) on TPU.

Flag-for-flag rebuild of reference train_psp.py (get_args :24-116, train_net
:245-391): encoder-only optimization unless --train_decoder, adam|ranger,
the pSpLoss lambda surface, non-finite-loss skip guard, eval every
n_train/(10*batch) steps with ssim/ms_ssim on (gen+1)/2 vs raw GT, per-epoch
G checkpoints under <checkpoint_path>/<run_name>/.

Pretrained weights (ir_se50 / stylegan g_ema / combined pSp ckpt) convert via
tools/convert_torch.py when the paths exist; otherwise training starts from
random init with a warning (this image has no network egress).
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
from face_mask_inpaint_tpu.losses.id_loss import make_backbone
from face_mask_inpaint_tpu.losses.lpips import LPIPSNet
from face_mask_inpaint_tpu.losses.psp_loss import PSPLossConfig
from face_mask_inpaint_tpu.losses.vgg import VGG16Features
from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_tree
from face_mask_inpaint_tpu.train import checkpoint as ckpt
from face_mask_inpaint_tpu.train.optim import (
    PlateauTracker, adam_injected, ranger_injected, set_learning_rate)
from face_mask_inpaint_tpu.train.psp import (
    make_psp_eval_step,
    make_psp_train_step,
    partitioned_tx,
)
from face_mask_inpaint_tpu.train.state import ModuleState, TrainState
from face_mask_inpaint_tpu.utils.metrics_logger import (
    MetricsLogger, histogram_summary)


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=5, help='Number of epochs')
    parser.add_argument('--batch_size', dest='batch_size', type=int, default=8)
    parser.add_argument('--learning_rate', type=float, default=1e-5)
    parser.add_argument('--eval_options', nargs="+", default={'ssim'})
    parser.add_argument('--debug', type=int, default=0,
                        help='debug with turning off not implemented parts')
    parser.add_argument('--img_scale', type=float, default=1.)
    parser.add_argument('--optimizer', type=str, default='adam')
    parser.add_argument('--use_ref', action='store_true', help='use reference image')
    parser.add_argument('--use_attention', action='store_true', help='use attention')

    # path args
    parser.add_argument('--run_name', type=str, default='', help='exp name')
    parser.add_argument('--checkpoint_path', type=str, default='saved_model')
    parser.add_argument('--mask_detector_path', type=str, default='')
    parser.add_argument('--data_root', type=str, default='/data/mohaa/project1/CelebA')
    parser.add_argument('--src_img_path', type=str, default='img_align_celeba_masked1')
    parser.add_argument('--ref_img_path', type=str, default='img_align_celeba')
    parser.add_argument('--mask_path', type=str, default='binary_map')
    parser.add_argument('--identity_file_path', type=str, default='identity_CelebA.txt')

    # pSp args
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

    # loss weights
    parser.add_argument('--lpips_lambda', default=0.8, type=float)
    parser.add_argument('--id_lambda', default=0, type=float)
    parser.add_argument('--l2_lambda', default=1.0, type=float)
    parser.add_argument('--w_norm_lambda', default=0, type=float)
    parser.add_argument('--lpips_lambda_ref', default=0, type=float)
    parser.add_argument('--l2_lambda_ref', default=0, type=float)
    parser.add_argument('--style_lambda', default=250, type=float)
    parser.add_argument('--cx_lambda', default=1, type=float)

    # pretrained weight paths
    parser.add_argument('--stylegan_weights', default=None, type=str,
                        help='Path to StyleGAN model weights')
    parser.add_argument('--pt_ckpt_path', default=None, type=str,
                        help='Path to pretrained pSp model checkpoint')

    # TPU-rebuild extras
    parser.add_argument('--irse50_weights', default='', type=str,
                        help='ir_se50 .pth for encoder init + ID loss')
    parser.add_argument('--inception_weights', type=str, default='',
                        help='torchvision inception_v3 .pth for --eval_options fid')
    parser.add_argument('--alexnet_weights', default='', type=str)
    parser.add_argument('--lpips_lin_weights', default='', type=str)
    parser.add_argument('--vgg_weights', default='', type=str)
    parser.add_argument('--use_wandb', type=int, default=0)
    parser.add_argument('--resume', type=int, default=0,
                        help='resume from the latest checkpoint under '
                             '<checkpoint_path>/<run_name> (full state)')
    from face_mask_inpaint_tpu.utils.profiling import add_profile_args
    add_profile_args(parser)
    args = parser.parse_args()

    args.src_img_path = os.path.join(args.data_root, args.src_img_path)
    args.ref_img_path = os.path.join(args.data_root, args.ref_img_path)
    args.mask_path = os.path.join(args.data_root, args.mask_path)
    args.identity_file_path = os.path.join(args.data_root, args.identity_file_path)
    args.train_decoder = bool(args.train_decoder)
    return args


def _maybe_convert(path, convert_fn, init_fn, what):
    if path and Path(path).is_file():
        from face_mask_inpaint_tpu.tools.convert_torch import load_torch_state_dict
        logging.info('Loading %s weights from %s', what, path)
        return jax.tree.map(jnp.asarray, convert_fn(load_torch_state_dict(path)))
    logging.warning('No pretrained %s weights; using random init', what)
    return init_fn()


def build_loss_nets(args, cfg: PSPLossConfig, sample_img):
    from face_mask_inpaint_tpu.tools import convert_torch as ct

    key = jax.random.PRNGKey(0)
    nets = {}
    if cfg.lpips_lambda > 0 or cfg.lpips_lambda_ref > 0:
        def init_lpips():
            return LPIPSNet('alex').init(key, sample_img, sample_img)['params']
        if args.alexnet_weights and args.lpips_lin_weights:
            nets['lpips'] = _maybe_convert(
                args.alexnet_weights,
                lambda sd: ct.convert_lpips_alex(
                    sd, ct.load_torch_state_dict(args.lpips_lin_weights)),
                init_lpips, 'LPIPS(alex)')
        else:
            nets['lpips'] = init_lpips()
            logging.warning('LPIPS running with random weights')
    if cfg.id_lambda > 0:
        def init_face():
            x = jnp.zeros((1, 112, 112, 3))
            return make_backbone().init(key, x, train=False)
        nets['facenet'] = _maybe_convert(
            args.irse50_weights, ct.convert_irse_backbone, init_face, 'ir_se50')
    if cfg.style_lambda > 0 or cfg.cx_lambda > 0:
        def init_vgg():
            return VGG16Features().init(key, sample_img)['params']
        nets['vgg'] = _maybe_convert(
            args.vgg_weights, ct.convert_vgg16_features, init_vgg, 'VGG16')
    return nets


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format='%(levelname)s: %(message)s')
    logging.info('Using devices %s', jax.devices())

    model = PSP(encoder_type=args.encoder_type, output_size=args.output_size,
                start_from_latent_avg=args.start_from_latent_avg,
                learn_in_w=args.learn_in_w, use_attention=args.use_attention)

    mesh = make_mesh()
    n_dev = mesh.shape['data']
    eff_bs = max(args.batch_size, n_dev) // n_dev * n_dev
    sharding = batch_sharding(mesh)
    train_loader, val_loader = get_reference_dataloader(
        args.src_img_path, args.ref_img_path, args.mask_path,
        args.identity_file_path, eff_bs, apply_transform=True, val_amount=0.1,
        num_workers=4, img_scale=args.img_scale, use_ssim=True,
        sharding=sharding)

    train_net(model, train_loader, val_loader, mesh, args, eff_bs)


def train_net(model, train_loader, val_loader, mesh, args, batch_size):
    run_dir = ckpt.checkpoint_dir(args.checkpoint_path, args.run_name)
    logger = MetricsLogger(run_dir, 'RefpSp', args.run_name, config=vars(args),
                           use_wandb=bool(args.use_wandb))
    n_train = len(train_loader) * batch_size

    if len(train_loader) == 0:
        raise SystemExit(
            'train loader is empty: need at least one full (device-divisible) '
            f'batch of {batch_size}; got {len(train_loader)} batches')
    sample = next(iter(train_loader))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    key = jax.random.PRNGKey(0)
    init_kwargs = dict(ref=sample['ref_img'][:1] if args.use_ref else None,
                       src_mask=(sample['mask'][:1] > 0).astype(jnp.float32)
                       if args.use_ref else None)
    variables = model.init({'params': key, 'noise': key},
                           sample['src_img'][:1], train=False, **init_kwargs)

    # pretrained loads (pSp.load_weights, psp.py:50-70)
    if args.pt_ckpt_path and Path(str(args.pt_ckpt_path)).is_file() and \
            str(args.pt_ckpt_path).endswith(('.pt', '.pth')):
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_psp, load_torch_state_dict)
        import flax.traverse_util as tu
        conv = convert_psp(load_torch_state_dict(args.pt_ckpt_path),
                           args.output_size)
        flat = tu.flatten_dict(variables)
        for k, v in tu.flatten_dict(conv).items():
            if k in flat and flat[k].shape == tuple(np.shape(v)):
                flat[k] = jnp.asarray(v)
        variables = tu.unflatten_dict(flat)
        logging.info('Loaded pSp from checkpoint: %s', args.pt_ckpt_path)
    elif args.stylegan_weights and Path(args.stylegan_weights).is_file():
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_stylegan2_generator, load_torch_state_dict)
        import flax.traverse_util as tu
        sd = load_torch_state_dict(args.stylegan_weights)
        gsd = {k[len('g_ema.'):]: v for k, v in sd.items()
               if k.startswith('g_ema.')} or sd
        conv = convert_stylegan2_generator(gsd, args.output_size)
        flat = tu.flatten_dict(variables)
        for k, v in tu.flatten_dict(
                {'params': {'decoder': conv['params']},
                 'noises': {'decoder': conv.get('noises', {})}}).items():
            if k in flat and flat[k].shape == tuple(np.shape(v)):
                flat[k] = jnp.asarray(v)
        variables = tu.unflatten_dict(flat)
        logging.info('Loaded decoder weights from %s', args.stylegan_weights)

    # latent_avg via decoder.mean_latent when absent (train_psp.py:133-134)
    if args.start_from_latent_avg and not np.any(
            np.asarray(variables['latent_avg']['value'])):
        avg = model.apply(variables, jax.random.PRNGKey(1), 10_000,
                          method=PSP.compute_latent_avg)
        variables = dict(variables)
        variables['latent_avg'] = {'value': avg}
        logging.info('Computed latent_avg from decoder.mean_latent')

    cfg = PSPLossConfig(
        id_lambda=args.id_lambda, lpips_lambda=args.lpips_lambda,
        l2_lambda=args.l2_lambda, style_lambda=args.style_lambda,
        lpips_lambda_ref=args.lpips_lambda_ref, l2_lambda_ref=args.l2_lambda_ref,
        cx_lambda=args.cx_lambda, w_norm_lambda=args.w_norm_lambda,
        start_from_latent_avg=args.start_from_latent_avg)
    nets = build_loss_nets(args, cfg, sample['gt_img'][:1])

    base_tx = (ranger_injected(args.learning_rate) if args.optimizer == 'ranger'
               else adam_injected(args.learning_rate))
    mstate = ModuleState.from_variables(variables)
    tx = partitioned_tx(base_tx, mstate.params, args.train_decoder)
    state = TrainState(step=jnp.zeros([], jnp.int32), model=mstate,
                       opt_state=tx.init(mstate.params), rng=key)

    # ReduceLROnPlateau parity (reference train_psp.py:294-298, stepped on the
    # val loss at :382 — mode='max', patience=2, factor=0.8).
    sched = PlateauTracker(args.learning_rate, mode='max', patience=2, factor=0.8)

    start_epoch = 0
    if args.resume:
        last = ckpt.latest_epoch(run_dir, 'G')
        if last is None:
            logging.warning('--resume set but no checkpoint under %s; '
                            'starting fresh', run_dir)
        else:
            target = {'state': state, 'sched': sched.state_dict()}
            restored = ckpt.restore_state(
                run_dir / f'G_checkpoint_epoch{last}', jax.device_get(target))
            state = restored['state']
            sched.load_state_dict(restored['sched'])
            start_epoch = last
            logging.info('Resumed from epoch %d (step %d, lr=%g)',
                         last, int(state.step), sched.lr)

    state = replicate_tree(state, mesh)
    nets = replicate_tree(nets, mesh)

    train_step = jax.jit(make_psp_train_step(
        model, tx, cfg, nets, use_ref=args.use_ref,
        randomize_noise=args.randomize_noise), donate_argnums=0)
    train_step_grads = jax.jit(make_psp_train_step(
        model, tx, cfg, nets, use_ref=args.use_ref,
        randomize_noise=args.randomize_noise, return_grads=True),
        donate_argnums=0)
    eval_step = jax.jit(make_psp_eval_step(model, cfg, nets, use_ref=args.use_ref))

    eval_options = set(args.eval_options)
    inception_vars = None
    if 'fid' in eval_options:
        # the reference surfaces an in-training fid option here too
        # (train_psp.py:214-237, broken there by the calculate_fid argument
        # misorder); computed correctly below: activations accumulate over
        # the whole val round, ONE dataset-level Fréchet distance.
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

    def evaluate(st, step_rng):
        metrics = {'validation loss': 0.0}
        n = 0
        gt_acts, gen_acts = [], []
        for batch in val_loader:
            b = dict(batch)
            b['mask'] = (np.asarray(batch['mask']) > 0).astype(np.float32)
            out = eval_step(st, b, step_rng)
            metrics['validation loss'] += float(out['loss'])
            gen01 = (out['gen'] + 1) / 2
            gt = jnp.asarray(batch['raw_gt_img'])
            if 'ssim' in eval_options:
                metrics['ssim'] = metrics.get('ssim', 0.0) + float(ssim_fn(gt, gen01))
            if 'ms_ssim' in eval_options and gen01.shape[1] > 160:
                metrics['ms_ssim'] = metrics.get('ms_ssim', 0.0) + float(
                    ms_ssim_fn(gt, gen01))
            if 'fid' in eval_options:
                from face_mask_inpaint_tpu.evaluations.fid import get_activations
                from face_mask_inpaint_tpu.ops.resize import scale_img
                bsz = gen01.shape[0]
                gt_acts.append(get_activations(
                    np.asarray(scale_img(gt, (299, 299))), bsz, inception_vars))
                gen_acts.append(get_activations(
                    np.asarray(jnp.clip(scale_img(gen01, (299, 299)), 0.0, 1.0)),
                    bsz, inception_vars))
            n += 1
        metrics = {k: v / max(n, 1) for k, v in metrics.items()}
        if 'fid' in eval_options and gt_acts:
            from face_mask_inpaint_tpu.evaluations.fid import (
                calculate_frechet_distance, statistics_from_activations)
            mu1, s1 = statistics_from_activations(np.concatenate(gt_acts))
            mu2, s2 = statistics_from_activations(np.concatenate(gen_acts))
            metrics['fid'] = calculate_frechet_distance(mu1, s1, mu2, s2)
        return metrics

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
                grads = metrics.pop('grads')
            else:
                state, metrics = train_step(state, b)
            global_step += 1
            logger.log({k: float(v) for k, v in metrics.items()} | {'epoch': epoch},
                       step=global_step)
            if is_eval_step:
                # weight+grad histograms excluding the style MLP, as the
                # reference does (train_psp.py:352-359 skips 'decoder.style')
                def drop_style(tree):
                    dec = dict(tree.get('decoder', {}))
                    dec.pop('style', None)
                    return {**tree, 'decoder': dec}
                host_params = jax.device_get(state.model.params)
                hists = histogram_summary(drop_style(host_params), 'Weights')
                hists.update(histogram_summary(
                    drop_style(jax.device_get(grads)), 'Gradients'))
                val_metrics = evaluate(state, jax.random.PRNGKey(global_step))
                state = state.replace(opt_state=set_learning_rate(
                    state.opt_state, sched.step(val_metrics['validation loss'])))
                val_metrics['lr'] = sched.lr
                logging.info('Validation: %s', val_metrics)
                logger.log({**val_metrics, **hists}, step=global_step)
        ckpt.save_state(run_dir, 'G', epoch + 1, {
            'state': jax.device_get(state), 'sched': sched.state_dict()})
        logging.info('Checkpoint epoch %d saved under %s', epoch + 1, run_dir)
    profiler.close()
    logger.close()
    return state


if __name__ == '__main__':
    main()
