"""SupOnly — supervised baseline without any SSL mechanics.

Re-design of the reference ``ssl_null`` (reference:
pixelssl/ssl_algorithm/ssl_null.py:26-244): one task model trained with the
task criterion on labeled data only; unlabeled data is rejected
(ssl_null.py:80-83). The whole iteration (forward, per-sample CE, grad,
pmean over ICI, SGD/poly-lr update, BN-stat psum) is one fused jitted step.
"""

import jax
import jax.numpy as jnp

from ..utils import logger
from ..utils.constant import REGRESSION, CLASSIFICATION
from ..task_template.model import check_resulter
from .ssl_base import SSLBase, TaskContext


def add_parser_arguments(parser):
    pass


def ssl_null(args, model_dict, optimizer_dict, lrer_dict, criterion_dict,
             task_func, **ctx_kwargs):
    """Export function (reference ssl_null.py:26-40): validates the
    component dicts and instantiates the algorithm."""
    if not len(model_dict) == len(optimizer_dict) == len(lrer_dict) == len(criterion_dict) == 1:
        logger.log_err('ssl_null requires exactly one model/optimizer/lrer/'
                       'criterion (keyed `model`)')
    if list(model_dict.keys()) != ['model']:
        logger.log_err('ssl_null requires component dicts keyed `model`, '
                       'got {0}'.format(list(model_dict.keys())))
    ctx = TaskContext(args, model_dict, optimizer_dict, lrer_dict,
                      criterion_dict, task_func, **ctx_kwargs)
    return SSLNULL(args, ctx)


class SSLNULL(SSLBase):
    NAME = 'ssl_null'
    SUPPORTED_TASK_TYPES = [REGRESSION, CLASSIFICATION]

    def __init__(self, args, ctx):
        super(SSLNULL, self).__init__(args, ctx)
        if ctx.ubs_local and ctx.ubs_local > 0:
            # reference ssl_null.py:80-83 — SupOnly cannot use unlabeled data
            logger.log_err('ssl_null does not support unlabeled data — '
                           'set unlabeled_batch_size to 0')
        self.model = ctx.models['model']
        self.criterion = ctx.criterions['model']
        lrer = ctx.lrers['model']
        opt = ctx.optimizers['model']
        self.lr_schedule = lrer.make(opt.base_lr, ctx.iters_per_epoch,
                                     args.epochs)
        self._opt_factory = opt

    def _build_state(self, rng):
        variables = self.model.init(rng, self.ctx.example_inp)
        params = variables['params']
        self.tx = self._opt_factory.make(self.lr_schedule,
                                         self.model.lr_mult(params))
        return {
            'model': {'params': params,
                      'batch_stats': variables.get('batch_stats', {})},
            'opt': self.tx.init(params),
        }

    def _step_fn(self, state, batch):
        inp, gt = batch['inp'], batch['gt']
        rng = self._step_rng(state)

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state['model']['batch_stats']}
            resulter, mutated = self.model.apply(
                variables, inp, train=True, rngs={'dropout': rng})
            check_resulter(resulter)
            loss_vec = self.criterion(resulter['pred'], gt, inp)
            loss = self._global_mean(loss_vec)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state['model']['params'])
        grads = self._pmean(grads)
        params, opt_state = self._apply_updates(
            self.tx, state['model']['params'], grads, state['opt'])

        new_state = dict(state)
        new_state['model'] = {'params': params,
                              'batch_stats': mutated.get('batch_stats', {})}
        new_state['opt'] = opt_state
        new_state['step'] = state['step'] + 1

        metrics = {'task_loss': loss,
                   'lr': jnp.asarray(self.lr_schedule(state['step']), jnp.float32)}
        return new_state, metrics

    def _eval_fn(self, state, batch):
        inp, gt = batch['inp'], batch['gt']
        variables = {'params': state['model']['params'],
                     'batch_stats': state['model']['batch_stats']}
        resulter, _ = self.model.apply(variables, inp, train=False)
        loss_vec = self.criterion(resulter['pred'], gt, inp)
        return {self.NAME: (resulter['activated_pred'], loss_vec)}
