"""CCT — Cross-Consistency Training (reference:
pixelssl/ssl_algorithm/ssl_cct.py).

    Ouali et al., "Semi-Supervised Semantic Segmentation with
    Cross-Consistency Training", CVPR'20.

Semantics preserved:

* main task model + N auxiliary decoders from 7 perturbation families
  (VAT, DropOut, guided CutOut, Context-/Object-masking, FeatureDrop,
  FeatureNoise — ssl_cct.py:133-187,542-745), each an UpsampleDecoder
  (1x1 conv + ICNR PixelShuffle) over the encoder latent
  ('sslcct_ad_inp');
* labeled pass: supervised CE on a separate forward (ssl_cct.py:243-254);
* unlabeled pass: the detached activated main pred is the target; every
  aux decoder consumes the (non-detached) latent, its output is bilinearly
  resized to the target and softmax-activated via the task hook; the
  consistency loss is the decoder-mean of MSEs, ramped and scaled
  (ssl_cct.py:459-486,233-237);
* aux decoder params train at lr·ad_lr_scale (ssl_cct.py:435-436);
* VAT's inner adversarial direction uses one nested gradient w.r.t. the
  perturbation only (ssl_cct.py:555-576) — expressed with jax.grad inside
  the step.

TPU-specific deviation (documented in models/cct_decoders.py): the guided
CutOut mask replaces cv2.findContours per-contour boxes with the per-sample
foreground bounding box computed by iota reductions — the reference's
contour walk is a host-side data-dependent op that cannot live in a traced
step.
"""

import functools

import jax
import jax.numpy as jnp

from ..models.cct_decoders import (element_dropout, feature_dropout,
                                   feature_noise, guided_cutout_mask,
                                   guided_masking, spatial_dropout,
                                   vat_perturbation)
from ..models.layers import resize_bilinear
from ..models.pspnet import UpsampleDecoder
from ..nn.func import sigmoid_rampup, split_tensor_tuple
from ..utils import cmd, logger
from ..utils.constant import CLASSIFICATION
from .ssl_base import SSLBase, TaskContext, aux_compute_dtype


def add_parser_arguments(parser):
    """Flags match reference ssl_cct.py:37-63."""
    parser.add_argument('--cons-scale', type=float, default=-1,
                        help='sslcct - consistency coefficient')
    parser.add_argument('--cons-rampup-epochs', type=int, default=-1,
                        help='sslcct - consistency ramp-up epochs')
    parser.add_argument('--ad-lr-scale', type=float, default=-1,
                        help='sslcct - aux decoder lr scale')
    parser.add_argument('--vat-dec-num', type=int, default=0)
    parser.add_argument('--vat-dec-xi', type=float, default=1e-6)
    parser.add_argument('--vat-dec-eps', type=float, default=2.0)
    parser.add_argument('--drop-dec-num', type=int, default=0)
    parser.add_argument('--drop-dec-rate', type=float, default=0.5)
    parser.add_argument('--drop-dec-spatial', type=cmd.str2bool, default=True)
    parser.add_argument('--cut-dec-num', type=int, default=0)
    parser.add_argument('--cut-dec-erase', type=float, default=0.4)
    parser.add_argument('--cut-dec-components', type=int, default=2,
                        help='sslcct - erase one box per top-N foreground '
                             'component (reference per-contour semantics, '
                             'ssl_cct.py:623-646); 0 = one union-bbox box '
                             '(cheaper, ~3x stronger on multi-object masks)')
    parser.add_argument('--context-dec-num', type=int, default=0)
    parser.add_argument('--object-dec-num', type=int, default=0)
    parser.add_argument('--fn-dec-num', type=int, default=0)
    parser.add_argument('--fn-dec-uniform', type=float, default=0.3)
    parser.add_argument('--fd-dec-num', type=int, default=0)


def ssl_cct(args, model_dict, optimizer_dict, lrer_dict, criterion_dict,
            task_func, **ctx_kwargs):
    if not len(model_dict) == len(optimizer_dict) == len(lrer_dict) == len(criterion_dict) == 1:
        logger.log_err('ssl_cct requires exactly one model/optimizer/lrer/criterion')
    if list(model_dict.keys()) != ['model']:
        logger.log_err('ssl_cct requires component dicts keyed `model`')
    ctx = TaskContext(args, model_dict, optimizer_dict, lrer_dict,
                      criterion_dict, task_func, **ctx_kwargs)
    return SSLCCT(args, ctx)


class SSLCCT(SSLBase):
    NAME = 'ssl_cct'
    SUPPORTED_TASK_TYPES = [CLASSIFICATION]

    def __init__(self, args, ctx):
        super(SSLCCT, self).__init__(args, ctx)
        self._decoder_specs = (
            [('vat', {'xi': args.vat_dec_xi, 'eps': args.vat_dec_eps})] * args.vat_dec_num +
            [('drop', {'rate': args.drop_dec_rate,
                       'spatial': args.drop_dec_spatial})] * args.drop_dec_num +
            [('cut', {'erase': args.cut_dec_erase,
                      'components': args.cut_dec_components})] * args.cut_dec_num +
            [('context', {})] * args.context_dec_num +
            [('object', {})] * args.object_dec_num +
            [('fdrop', {})] * args.fd_dec_num +
            [('fnoise', {'uniform': args.fn_dec_uniform})] * args.fn_dec_num)

        if (ctx.ubs_local or 0) > 0:
            if not self._decoder_specs:
                logger.log_err('ssl_cct requires at least one auxiliary decoder')
            if args.cons_scale < 0:
                logger.log_err('ssl_cct requires --cons-scale >= 0')
            if args.cons_rampup_epochs < 0:
                logger.log_err('ssl_cct requires --cons-rampup-epochs >= 0')
            if args.ad_lr_scale < 0:
                logger.log_err('ssl_cct requires --ad-lr-scale >= 0')

        self.model = ctx.models['model']
        self.criterion = ctx.criterions['model']
        opt = ctx.optimizers['model']
        self.lr_schedule = ctx.lrers['model'].make(opt.base_lr,
                                                   ctx.iters_per_epoch,
                                                   args.epochs)
        self._opt_factory = opt

        self.ad_module = UpsampleDecoder(
            out_channels=ctx.task_func.sslcct_ad_out_channels(),
            upscale=ctx.task_func.sslcct_ad_upsample_scale(),
            dtype=aux_compute_dtype(args))

    def _build_state(self, rng):
        ctx = self.ctx
        keys = jax.random.split(rng, len(self._decoder_specs) + 1)
        variables = self.model.init(keys[0], ctx.example_inp)
        main_params = variables['params']

        # aux decoders consume the latent: infer its shape with one apply
        resulter, _ = self.model.apply(
            {'params': main_params,
             'batch_stats': variables.get('batch_stats', {})},
            tuple(map(jnp.asarray, ctx.example_inp)), train=False)
        latent = resulter['sslcct_ad_inp']

        ad_params = {}
        for i, _ in enumerate(self._decoder_specs):
            ad_params['ad_{0}'.format(i)] = self.ad_module.init(
                keys[i + 1], latent)['params']

        params = {'main': main_params, 'ads': ad_params}
        lr_mult = {'main': self.model.lr_mult(main_params),
                   'ads': jax.tree.map(
                       lambda _: jnp.asarray(max(self.args.ad_lr_scale, 0.0),
                                             jnp.float32), ad_params)}
        self.tx = self._opt_factory.make(self.lr_schedule, lr_mult)

        return {
            'model': {'params': params,
                      'batch_stats': variables.get('batch_stats', {})},
            'opt': self.tx.init(params),
        }

    # ------------------------------------------------------------------

    def _apply_decoder(self, spec, dec_params, latent, main_pred, rng):
        """One perturbation + decode (reference ssl_cct.py:463-470)."""
        family, cfg = spec
        dec_apply = functools.partial(self.ad_module.apply,
                                      {'params': dec_params})
        if family == 'vat':
            r_adv = vat_perturbation(dec_apply, latent, rng,
                                     cfg['xi'], cfg['eps'])
            return dec_apply(latent + r_adv)
        if family == 'drop':
            if cfg['spatial']:
                return dec_apply(spatial_dropout(latent, rng, cfg['rate']))
            return dec_apply(element_dropout(latent, rng, cfg['rate']))
        if family == 'cut':
            mask = guided_cutout_mask(main_pred, rng, cfg['erase'],
                                      latent.shape[1:3],
                                      n_components=cfg['components'])
            return dec_apply(latent * mask.astype(latent.dtype))
        if family == 'context':
            return dec_apply(guided_masking(latent, main_pred, True))
        if family == 'object':
            return dec_apply(guided_masking(latent, main_pred, False))
        if family == 'fdrop':
            return dec_apply(feature_dropout(latent, rng))
        if family == 'fnoise':
            return dec_apply(feature_noise(latent, rng, cfg['uniform']))
        raise ValueError('unknown decoder family {0}'.format(family))

    def _step_fn(self, state, batch):
        args = self.args
        ctx = self.ctx
        task_func = ctx.task_func
        inp, gt = batch['inp'], batch['gt']
        lbs = ctx.lbs_local
        ubs = ctx.ubs_local or 0
        rng = self._step_rng(state)

        cur_step = state['step'].astype(jnp.float32)
        total = float(ctx.iters_per_epoch * max(args.cons_rampup_epochs, 0))
        rampup = sigmoid_rampup(cur_step, total)

        l_inp = split_tensor_tuple(inp, 0, lbs)
        l_gt = split_tensor_tuple(gt, 0, lbs)
        if ubs > 0:
            ul_inp = split_tensor_tuple(inp, lbs, lbs + ubs)

        def loss_fn(params):
            main_params = params['main']
            variables = {'params': main_params,
                         'batch_stats': state['model']['batch_stats']}
            # labeled forward (own BN batch, reference ssl_cct.py:243-254)
            l_resulter, mutated = self.model.apply(variables, l_inp, train=True)
            task_loss = self._global_mean(
                self.criterion(l_resulter['pred'], l_gt, l_inp))

            cons_loss = jnp.zeros((), jnp.float32)
            if ubs > 0:
                variables2 = {'params': main_params,
                              'batch_stats': mutated['batch_stats']}
                ul_resulter, mutated = self.model.apply(variables2, ul_inp,
                                                        train=True)
                latent = ul_resulter['sslcct_ad_inp']
                main_pred = jax.lax.stop_gradient(ul_resulter['pred'][0])
                ad_gt = jax.lax.stop_gradient(
                    ul_resulter['activated_pred'][0].astype(jnp.float32))

                ad_preds = []
                dec_rngs = jax.random.split(rng, len(self._decoder_specs))
                for i, spec in enumerate(self._decoder_specs):
                    p = self._apply_decoder(
                        spec, params['ads']['ad_{0}'.format(i)], latent,
                        main_pred, dec_rngs[i])
                    p = resize_bilinear(p.astype(jnp.float32),
                                        ad_gt.shape[1:3], align_corners=False)
                    ad_preds.append(p)
                activated = task_func.sslcct_activate_ad_preds(ad_preds)
                mses = [self._global_mean(jnp.mean(
                    jnp.square(a - ad_gt), axis=(1, 2, 3)))
                    for a in activated]
                cons_loss = sum(mses) / len(mses)
                cons_loss = rampup * args.cons_scale * cons_loss

            return task_loss + cons_loss, (mutated, task_loss, cons_loss)

        (_, (mutated, task_loss, cons_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state['model']['params'])
        grads = self._pmean(grads)
        params, opt_state = self._apply_updates(
            self.tx, state['model']['params'], grads, state['opt'])

        new_state = dict(state)
        new_state['model'] = {'params': params,
                              'batch_stats': mutated.get('batch_stats', {})}
        new_state['opt'] = opt_state
        new_state['step'] = state['step'] + 1

        metrics = {'task_loss': task_loss, 'cons_loss': cons_loss,
                   'lr': jnp.asarray(self.lr_schedule(state['step']), jnp.float32)}
        return new_state, metrics

    def _eval_fn(self, state, batch):
        inp, gt = batch['inp'], batch['gt']
        variables = {'params': state['model']['params']['main'],
                     'batch_stats': state['model']['batch_stats']}
        resulter, _ = self.model.apply(variables, inp, train=False)
        loss_vec = self.criterion(resulter['pred'], gt, inp)
        return {self.NAME: (resulter['activated_pred'], loss_vec)}
