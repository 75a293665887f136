"""Mean Teacher (reference: pixelssl/ssl_algorithm/ssl_mt.py).

    Tarvainen & Valpola, "Mean teachers are better role models", NeurIPS'17.

Semantics preserved from the reference:

* student + EMA teacher of the same architecture (ssl_mt.py:95-103);
* Gaussian input noise independently applied to the first input element of
  BOTH student and teacher, train only (ssl_mt.py:120,337-357);
* supervised CE on the labeled slice (ssl_mt.py:154-161);
* consistency = MSE between raw student and teacher predictions (teacher
  detached), on the full batch if --cons-for-labeled else the unlabeled
  slice, scaled by sigmoid ramp-up over cons_rampup_epochs
  (ssl_mt.py:179-188,140-142);
* EMA after every optimizer step with decay min(1−1/(step+1), ema_decay)
  (ssl_mt.py:196,359-363);
* validation scores BOTH student and teacher (ssl_mt.py:226-290).

TPU-first: the reference runs 2 DataParallel forwards + a Python-loop EMA
per iteration; here the noised double forward, CE+MSE losses, gradient
pmean, SGD update and the EMA tree_map are ONE fused jitted step — the EMA
is a single elementwise kernel over the parameter pytree.
"""

import jax
import jax.numpy as jnp

from ..nn.func import sigmoid_rampup, split_tensor_tuple
from ..nn.module import gaussian_noise
from ..utils import cmd, logger
from ..utils.constant import REGRESSION, CLASSIFICATION
from ..task_template.model import check_resulter
from .ssl_base import SSLBase, TaskContext, ema_update, maybe_bf16


def add_parser_arguments(parser):
    """Flags match reference ssl_mt.py:30-38."""
    parser.add_argument('--cons-for-labeled', type=cmd.str2bool, default=True,
                        help='sslmt - consistency on labeled data too')
    parser.add_argument('--cons-scale', type=float, default=-1,
                        help='sslmt - consistency coefficient')
    parser.add_argument('--cons-rampup-epochs', type=int, default=-1,
                        help='sslmt - consistency ramp-up epochs')
    parser.add_argument('--ema-decay', type=float, default=0.999,
                        help='sslmt - teacher EMA decay')
    parser.add_argument('--bf16-ema', type=cmd.str2bool, default=False,
                        help='sslmt - store the EMA teacher in bf16 '
                             '(halves EMA HBM traffic; forward compute '
                             'is bf16 anyway — TPU build addition). '
                             'Caveat: updates below the bf16 half-ULP '
                             'are rounded away, so the teacher stops '
                             'tracking near convergence — keep fp32 for '
                             'benchmark-fidelity runs '
                             '(docs/performance.md)')
    parser.add_argument('--gaussian-noise-std', type=float, default=None,
                        help='sslmt - std of input gaussian noise (None disables)')


def ssl_mt(args, model_dict, optimizer_dict, lrer_dict, criterion_dict,
           task_func, **ctx_kwargs):
    if not len(model_dict) == len(optimizer_dict) == len(lrer_dict) == len(criterion_dict) == 1:
        logger.log_err('ssl_mt requires exactly one model/optimizer/lrer/criterion')
    if list(model_dict.keys()) != ['model']:
        logger.log_err('ssl_mt requires component dicts keyed `model`')
    ctx = TaskContext(args, model_dict, optimizer_dict, lrer_dict,
                      criterion_dict, task_func, **ctx_kwargs)
    return SSLMT(args, ctx)


class SSLMT(SSLBase):
    NAME = 'ssl_mt'
    SUPPORTED_TASK_TYPES = [REGRESSION, CLASSIFICATION]

    def __init__(self, args, ctx):
        super(SSLMT, self).__init__(args, ctx)
        # hyperparameter validation (reference ssl_mt.py:77-89)
        if args.cons_for_labeled or (ctx.ubs_local or 0) > 0:
            if args.cons_scale < 0:
                logger.log_err('ssl_mt requires --cons-scale >= 0')
            if args.cons_rampup_epochs < 0:
                logger.log_err('ssl_mt requires --cons-rampup-epochs >= 0')

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

    # ------------------------------------------------------------------

    def _noised(self, rng, inp):
        """Noise the first input element (reference ssl_mt.py:337-357)."""
        std = self.args.gaussian_noise_std
        if std is None or std <= 0:
            return inp
        return (gaussian_noise(rng, inp[0], std),) + tuple(inp[1:])

    def _step_fn(self, state, batch):
        args = self.args
        ctx = self.ctx
        inp, gt = batch['inp'], batch['gt']
        lbs = ctx.lbs_local
        rng = self._step_rng(state)
        k_s, k_t = jax.random.split(rng)

        s_inp = self._noised(k_s, inp)
        t_inp = self._noised(k_t, inp)

        cur_step = state['step'].astype(jnp.float32)
        total = float(ctx.iters_per_epoch * args.cons_rampup_epochs)
        rampup = sigmoid_rampup(cur_step, total)

        # teacher forward (no grad; its BN stats update from its own pass,
        # matching t_model.train() in the reference)
        t_vars = {'params': state['teacher']['params'],
                  'batch_stats': state['teacher']['batch_stats']}
        t_resulter, t_mutated = self.model.apply(t_vars, t_inp, train=True)
        t_pred = jax.lax.stop_gradient(t_resulter['pred'])

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state['model']['batch_stats']}
            s_resulter, mutated = self.model.apply(variables, s_inp, train=True)
            check_resulter(s_resulter)
            s_pred = s_resulter['pred']

            # supervised CE on the labeled slice
            l_pred = split_tensor_tuple(s_pred, 0, lbs)
            l_gt = split_tensor_tuple(gt, 0, lbs)
            l_inp = split_tensor_tuple(s_inp, 0, lbs)
            task_loss = self._global_mean(self.criterion(l_pred, l_gt, l_inp))

            # consistency MSE on raw preds (reference ssl_mt.py:179-188)
            if args.cons_for_labeled:
                diff = s_pred[0] - t_pred[0]
            elif (ctx.ubs_local or 0) > 0:
                diff = s_pred[0][lbs:] - t_pred[0][lbs:]
            else:
                diff = jnp.zeros_like(s_pred[0][:1])
            cons_mse = self._global_mean(
                jnp.mean(jnp.square(diff.astype(jnp.float32)),
                         axis=tuple(range(1, diff.ndim))))
            cons_loss = rampup * args.cons_scale * cons_mse

            return task_loss + cons_loss, (mutated, task_loss, cons_loss)

        (_, (mutated, task_loss, cons_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state['model']['params'])
        grads = self._pmean(grads)
        params, opt_state = self._apply_updates(
            self.tx, state['model']['params'], grads, state['opt'])

        # teacher loss on labeled slice, for logging (ssl_mt.py:164-175)
        t_task_loss = self._global_mean(self.criterion(
            split_tensor_tuple(t_pred, 0, lbs),
            split_tensor_tuple(gt, 0, lbs),
            split_tensor_tuple(t_inp, 0, lbs)))

        # EMA teacher update (reference ssl_mt.py:359-363) — one tree_map
        decay = jnp.minimum(1.0 - 1.0 / (cur_step + 1.0), args.ema_decay)
        t_params = ema_update(state['teacher']['params'], params, decay)

        new_state = dict(state)
        new_state['model'] = {'params': params,
                              'batch_stats': mutated.get('batch_stats', {})}
        new_state['teacher'] = {'params': t_params,
                                'batch_stats': t_mutated.get('batch_stats', {})}
        new_state['opt'] = opt_state
        new_state['step'] = state['step'] + 1

        metrics = {'s_task_loss': task_loss, 'cons_loss': cons_loss,
                   't_task_loss': t_task_loss,
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
