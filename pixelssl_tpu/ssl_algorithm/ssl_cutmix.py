"""CutMix consistency (reference: pixelssl/ssl_algorithm/ssl_cutmix.py).

    French et al., "Semi-supervised semantic segmentation needs strong,
    varied perturbations", BMVC'20.

Semantics preserved:

* student + EMA teacher (decay 0.99 default, ssl_cutmix.py:434-438);
* unlabeled batch split in halves, mixed input = mask·u1 + (1−mask)·u2
  with an inverted in-bounds box mask per pair (ssl_cutmix.py:419-430);
* teacher no-grad activated preds on the two UNMIXED halves, mixed with the
  same mask → pseudo-GT (ssl_cutmix.py:189-203);
* confidence = mean over pixels of (max prob > threshold), a scalar
  multiplying the MSE consistency (ssl_cutmix.py:198-215);
* ramp-up as MT; supervised CE on the labeled slice via a separate student
  forward (ssl_cutmix.py:151-166);
* unlabeled batch must be even and > 2 (ssl_cutmix.py:82-85).

TPU-first: the reference generates box masks on host numpy and uploads them
every iteration; here masks are rasterized on device with iota comparisons
(ops/boxmask.py) and the whole 3-forward iteration + EMA fuses into one
jitted step.
"""

import jax
import jax.numpy as jnp

from ..nn.func import sigmoid_rampup, split_tensor_tuple
from ..ops.boxmask import box_masks
from ..utils import cmd, logger
from ..utils.constant import CLASSIFICATION
from ..task_template.model import check_resulter
from .ssl_base import SSLBase, TaskContext, ema_update, maybe_bf16


def add_parser_arguments(parser):
    """Flags match reference ssl_cutmix.py:37-45."""
    parser.add_argument('--cons-type', type=str, default='mse', choices=['mse'],
                        help='sslcutmix - consistency type')
    parser.add_argument('--cons-scale', type=float, default=-1,
                        help='sslcutmix - consistency coefficient')
    parser.add_argument('--cons-rampup-epochs', type=int, default=-1,
                        help='sslcutmix - consistency ramp-up epochs')
    parser.add_argument('--cons-threshold', type=float, default=-1,
                        help='sslcutmix - confidence threshold')
    parser.add_argument('--ema-decay', type=float, default=0.99,
                        help='sslcutmix - teacher EMA decay')
    parser.add_argument('--bf16-ema', type=cmd.str2bool, default=False,
                        help='sslcutmix - store the EMA teacher in bf16 '
                             '(TPU build addition)')
    parser.add_argument('--mask-prop-range', type=cmd.str2floatlist,
                        default='(0.5, 0.5)', help='sslcutmix - mixing ratio range')


def ssl_cutmix(args, model_dict, optimizer_dict, lrer_dict, criterion_dict,
               task_func, **ctx_kwargs):
    if not len(model_dict) == len(optimizer_dict) == len(lrer_dict) == len(criterion_dict) == 1:
        logger.log_err('ssl_cutmix requires exactly one model/optimizer/lrer/criterion')
    if list(model_dict.keys()) != ['model']:
        logger.log_err('ssl_cutmix requires component dicts keyed `model`')
    ctx = TaskContext(args, model_dict, optimizer_dict, lrer_dict,
                      criterion_dict, task_func, **ctx_kwargs)
    return SSLCUTMIX(args, ctx)


class SSLCUTMIX(SSLBase):
    NAME = 'ssl_cutmix'
    SUPPORTED_TASK_TYPES = [CLASSIFICATION]

    def __init__(self, args, ctx):
        super(SSLCUTMIX, self).__init__(args, ctx)
        ubs_l = ctx.ubs_local or 0
        if ubs_l > 0:
            # per-device halves (reference checks the global batch,
            # ssl_cutmix.py:82-85; under the mesh each device mixes its own
            # local halves so the local size must be even too)
            if ubs_l < 2 or ubs_l % 2 != 0:
                logger.log_err('ssl_cutmix requires an even per-device '
                               'unlabeled batch size >= 2 (got {0})'.format(ubs_l))
            if args.cons_scale < 0:
                logger.log_err('ssl_cutmix requires --cons-scale >= 0')
            if args.cons_rampup_epochs < 0:
                logger.log_err('ssl_cutmix requires --cons-rampup-epochs >= 0')
            if not 0 <= args.cons_threshold <= 1:
                logger.log_err('ssl_cutmix requires 0 <= --cons-threshold <= 1')

        self.model = ctx.models['model']
        self.criterion = ctx.criterions['model']
        opt = ctx.optimizers['model']
        self.lr_schedule = ctx.lrers['model'].make(opt.base_lr,
                                                   ctx.iters_per_epoch,
                                                   args.epochs)
        self._opt_factory = opt

    def _build_state(self, rng):
        variables = self.model.init(rng, self.ctx.example_inp)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        self.tx = self._opt_factory.make(self.lr_schedule,
                                         self.model.lr_mult(params))
        return {
            'model': {'params': params, 'batch_stats': batch_stats},
            'teacher': {'params': maybe_bf16(
                jax.tree.map(jnp.copy, params),
                getattr(self.args, 'bf16_ema', False)),
                        'batch_stats': jax.tree.map(jnp.copy, batch_stats)},
            'opt': self.tx.init(params),
        }

    def _step_fn(self, state, batch):
        args = self.args
        ctx = self.ctx
        inp, gt = batch['inp'], batch['gt']
        lbs = ctx.lbs_local
        ubs = ctx.ubs_local or 0
        rng = self._step_rng(state)

        cur_step = state['step'].astype(jnp.float32)
        total = float(ctx.iters_per_epoch * args.cons_rampup_epochs)
        rampup = sigmoid_rampup(cur_step, total)

        l_inp = split_tensor_tuple(inp, 0, lbs)
        l_gt = split_tensor_tuple(gt, 0, lbs)

        if ubs > 0:
            u_inp = split_tensor_tuple(inp, lbs, lbs + ubs)
            half = ubs // 2
            sample_shape = u_inp[0].shape[1:3]
            mask = box_masks(rng, half, sample_shape,
                             args.mask_prop_range, invert=True)

            # mixed student inputs (mask broadcast over trailing channels)
            mix_u_inp = tuple(mask * ui[:half] + (1.0 - mask) * ui[half:]
                              for ui in u_inp)

            # teacher on the UNMIXED unlabeled batch (no grad)
            t_vars = {'params': state['teacher']['params'],
                      'batch_stats': state['teacher']['batch_stats']}
            u_t_resulter, t_mutated = self.model.apply(t_vars, u_inp, train=True)
            u_t_act = jax.lax.stop_gradient(u_t_resulter['activated_pred'])

            mix_t_act, confidences = [], []
            for up in u_t_act:
                mp = mask * up[:half] + (1.0 - mask) * up[half:]
                mix_t_act.append(mp)
                conf = jnp.mean((jnp.max(mp, axis=-1) > args.cons_threshold)
                                .astype(jnp.float32))
                confidences.append(self._pmean(conf))
        else:
            mix_u_inp = None
            t_mutated = {'batch_stats': state['teacher']['batch_stats']}

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state['model']['batch_stats']}
            # labeled forward (own BN batch, like the reference's separate
            # DataParallel call)
            l_resulter, mutated = self.model.apply(variables, l_inp, train=True)
            check_resulter(l_resulter)
            task_loss = self._global_mean(
                self.criterion(l_resulter['pred'], l_gt, l_inp))

            cons_loss = jnp.zeros((), jnp.float32)
            if ubs > 0:
                variables2 = {'params': params,
                              'batch_stats': mutated['batch_stats']}
                u_resulter, mutated = self.model.apply(variables2, mix_u_inp,
                                                       train=True)
                mix_s_act = u_resulter['activated_pred']
                for msap, mtap, conf in zip(mix_s_act, mix_t_act, confidences):
                    mse = self._global_mean(
                        jnp.mean(jnp.square(msap.astype(jnp.float32) -
                                            mtap.astype(jnp.float32)),
                                 axis=tuple(range(1, msap.ndim))))
                    cons_loss = cons_loss + mse * conf
                cons_loss = rampup * args.cons_scale * cons_loss

            return task_loss + cons_loss, (mutated, task_loss, cons_loss)

        (_, (mutated, task_loss, cons_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state['model']['params'])
        grads = self._pmean(grads)
        params, opt_state = self._apply_updates(
            self.tx, state['model']['params'], grads, state['opt'])

        decay = jnp.minimum(1.0 - 1.0 / (cur_step + 1.0), args.ema_decay)
        t_params = ema_update(state['teacher']['params'], params, decay)

        new_state = dict(state)
        new_state['model'] = {'params': params,
                              'batch_stats': mutated.get('batch_stats', {})}
        new_state['teacher'] = {'params': t_params,
                                'batch_stats': t_mutated.get('batch_stats', {})}
        new_state['opt'] = opt_state
        new_state['step'] = state['step'] + 1

        metrics = {'task_loss': task_loss, 'cons_loss': cons_loss,
                   'lr': jnp.asarray(self.lr_schedule(state['step']), jnp.float32)}
        return new_state, metrics

    def _eval_fn(self, state, batch):
        inp, gt = batch['inp'], batch['gt']
        out = {}
        for model_id, key in (('student', 'model'), ('teacher', 'teacher')):
            variables = {'params': state[key]['params'],
                         'batch_stats': state[key]['batch_stats']}
            resulter, _ = self.model.apply(variables, inp, train=False)
            loss_vec = self.criterion(resulter['pred'], gt, inp)
            out[model_id] = (resulter['activated_pred'], loss_vec)
        return out
