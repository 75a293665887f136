"""S4L — self-supervised semi-supervised learning (reference:
pixelssl/ssl_algorithm/ssl_s4l.py).

    Zhai et al., "S4L: Self-Supervised Semi-Supervised Learning", ICCV'19
    (4-angle rotation pretext variant for pixel tasks).

Semantics preserved:

* the batch is doubled inside the step: for each sample a copy rotated by a
  random angle ∈ {90°,180°,270°} is appended — BOTH input and dense GT
  rotate together (ssl_s4l.py:296-350); layout [originals ++ rotated],
  rotation GT = [0]*bs ++ angles;
* task model + RotationClassifier fused into one wrapped model whose
  resulter gains a 'rotation' key fed from 'ssls4l_rc_inp'
  (ssl_s4l.py:403-438); the classifier's params join the optimizer at 1x lr
  (ssl_s4l.py:410-411);
* losses: sup CE on unrotated labeled + scaled CE on rotated labeled +
  scaled rotation CE on the WHOLE doubled batch; rotation accuracy metric
  (ssl_s4l.py:139-173).

TPU-first: the reference rotated tensors sample-by-sample in a Python loop
on device (ssl_s4l.py:302-335); here all four rotations of the batch are
materialized with static transposes/flips and gathered per-sample by angle
index — fully traced, no host loop — and the whole doubled-batch forward +
three losses + update fuse into one jitted step.
"""

import flax.linen as nn_flax
import jax
import jax.numpy as jnp

from ..models.rotation import RotationClassifier
from ..nn.func import split_tensor_tuple
from ..parallel import DATA_AXIS
from ..utils import logger
from ..utils.constant import REGRESSION, CLASSIFICATION
from .ssl_base import SSLBase, TaskContext, aux_compute_dtype


def add_parser_arguments(parser):
    """Flags match reference ssl_s4l.py:29-30."""
    parser.add_argument('--rotated-sup-scale', type=float, default=-1,
                        help='ssls4l - supervised coefficient on rotated labeled data')
    parser.add_argument('--rotation-scale', type=float, default=-1,
                        help='ssls4l - rotation self-supervision coefficient')


def ssl_s4l(args, model_dict, optimizer_dict, lrer_dict, criterion_dict,
            task_func, **ctx_kwargs):
    if not len(model_dict) == len(optimizer_dict) == len(lrer_dict) == len(criterion_dict) == 1:
        logger.log_err('ssl_s4l requires exactly one model/optimizer/lrer/criterion')
    if list(model_dict.keys()) != ['model']:
        logger.log_err('ssl_s4l requires component dicts keyed `model`')
    ctx = TaskContext(args, model_dict, optimizer_dict, lrer_dict,
                      criterion_dict, task_func, **ctx_kwargs)
    return SSLS4L(args, ctx)


class WrappedS4LModule(nn_flax.Module):
    """Task module + rotation classifier (reference ssl_s4l.py:403-438).
    The RC submodule is named 'rc' so task lr-mult path rules (e.g.
    'classifier' → 10x) cannot accidentally match it."""
    task: nn_flax.Module
    rc_dtype: jnp.dtype = jnp.float32
    rc_axis_name: str = DATA_AXIS

    @nn_flax.compact
    def __call__(self, inp, train: bool):
        resulter = self.task(inp, train)
        if 'ssls4l_rc_inp' not in resulter:
            raise ValueError("ssl_s4l requires resulter key 'ssls4l_rc_inp'")
        rc = RotationClassifier(axis_name=self.rc_axis_name, name='rc',
                                dtype=self.rc_dtype)
        resulter = dict(resulter)
        resulter['rotation'] = rc(resulter['ssls4l_rc_inp'], train)
        return resulter


def rotate_batch(x, angles, spatial_axes=(1, 2)):
    """Per-sample rotation by angle index {0:0°,1:90°cw,2:180°,3:270°cw},
    matching the reference's transpose/flip recipes (ssl_s4l.py:352-360).
    ``x`` is [B,H,W,...]; requires H == W (square crops)."""
    a1, a2 = spatial_axes
    r0 = x
    r1 = jnp.flip(jnp.swapaxes(x, a1, a2), a2)      # torch transpose(1,2).flip(2)
    r2 = jnp.flip(jnp.flip(x, a2), a1)              # torch flip(2).flip(1)
    r3 = jnp.flip(jnp.swapaxes(x, a1, a2), a1)      # torch transpose(1,2).flip(1)
    stacked = jnp.stack([r0, r1, r2, r3], axis=0)   # [4, B, ...]
    return stacked[angles, jnp.arange(x.shape[0])]


class SSLS4L(SSLBase):
    NAME = 'ssl_s4l'
    # rotation pretext is task-agnostic: dense GT rotates with the input and
    # the sup loss comes from the task criterion (reference ssl_s4l.py:52)
    SUPPORTED_TASK_TYPES = [REGRESSION, CLASSIFICATION]

    def __init__(self, args, ctx):
        super(SSLS4L, self).__init__(args, ctx)
        if args.rotation_scale < 0:
            logger.log_err('ssl_s4l requires --rotation-scale >= 0')
        if args.rotated_sup_scale < 0:
            logger.log_err('ssl_s4l requires --rotated-sup-scale >= 0')

        task_model = ctx.models['model']
        self.task_model = task_model
        self.model_module = WrappedS4LModule(task=task_model.module,
                                             rc_dtype=aux_compute_dtype(args),
                                             rc_axis_name=ctx.axis_name)
        self.criterion = ctx.criterions['model']
        opt = ctx.optimizers['model']
        self.lr_schedule = ctx.lrers['model'].make(opt.base_lr,
                                                   ctx.iters_per_epoch,
                                                   args.epochs)
        self._opt_factory = opt

    def _build_state(self, rng):
        # init with the doubled batch layout
        example = tuple(jnp.concatenate([e, e], axis=0)
                        for e in map(jnp.asarray, self.ctx.example_inp))
        variables = self.model_module.init(rng, example, train=False)
        params = variables['params']
        self.tx = self._opt_factory.make(self.lr_schedule,
                                         self.task_model.lr_mult(params))
        return {
            'model': {'params': params,
                      'batch_stats': variables.get('batch_stats', {})},
            'opt': self.tx.init(params),
        }

    def _double_batch(self, rng, inp, gt):
        """Append rotated copies (reference ssl_s4l.py:296-350)."""
        bs = inp[0].shape[0]
        angles = jax.random.randint(rng, (bs,), 1, 4)
        new_inp = tuple(jnp.concatenate([i, rotate_batch(i, angles)], axis=0)
                        for i in inp)
        new_gt = tuple(jnp.concatenate([g, rotate_batch(g, angles)], axis=0)
                       for g in gt)
        rotation_gt = jnp.concatenate(
            [jnp.zeros((bs,), jnp.int32), angles.astype(jnp.int32)], axis=0)
        return new_inp, new_gt, rotation_gt

    def _step_fn(self, state, batch):
        args = self.args
        ctx = self.ctx
        rng = self._step_rng(state)
        lbs = ctx.lbs_local
        bs = lbs + (ctx.ubs_local or 0)

        inp, gt, rotation_gt = self._double_batch(rng, batch['inp'],
                                                  batch['gt'])

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state['model']['batch_stats']}
            resulter, mutated = self.model_module.apply(
                variables, inp, train=True, mutable=['batch_stats'])
            pred = resulter['pred']
            pred_rotation = resulter['rotation']

            # sup CE on unrotated labeled
            unrot = self._global_mean(self.criterion(
                split_tensor_tuple(pred, 0, lbs),
                split_tensor_tuple(gt, 0, lbs),
                split_tensor_tuple(inp, 0, lbs)))
            # sup CE on rotated labeled (slice [bs : bs+lbs])
            rot = args.rotated_sup_scale * self._global_mean(self.criterion(
                split_tensor_tuple(pred, bs, bs + lbs),
                split_tensor_tuple(gt, bs, bs + lbs),
                split_tensor_tuple(inp, bs, bs + lbs)))

            # rotation CE over the whole doubled batch
            logp = jax.nn.log_softmax(pred_rotation, axis=-1)
            rot_ce = -jnp.take_along_axis(logp, rotation_gt[:, None],
                                          axis=-1)[:, 0]
            rotation_loss = args.rotation_scale * self._global_mean(rot_ce)

            rotation_acc = self._global_mean(
                (jnp.argmax(pred_rotation, axis=-1) == rotation_gt)
                .astype(jnp.float32)) * 100.0

            loss = unrot + rot + rotation_loss
            return loss, (mutated, unrot, rot, rotation_loss, rotation_acc)

        (_, (mutated, unrot, rot, rotation_loss, rotation_acc)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state['model']['params'])
        grads = self._pmean(grads)
        params, opt_state = self._apply_updates(
            self.tx, state['model']['params'], grads, state['opt'])

        new_state = dict(state)
        new_state['model'] = {'params': params,
                              'batch_stats': mutated.get('batch_stats', {})}
        new_state['opt'] = opt_state
        new_state['step'] = state['step'] + 1

        metrics = {'unrotated_task_loss': unrot, 'rotated_task_loss': rot,
                   'rotation_loss': rotation_loss, 'rotation_acc': rotation_acc,
                   'lr': jnp.asarray(self.lr_schedule(state['step']), jnp.float32)}
        return new_state, metrics

    def _eval_fn(self, state, batch):
        inp, gt = batch['inp'], batch['gt']
        variables = {'params': state['model']['params'],
                     'batch_stats': state['model']['batch_stats']}
        resulter = self.model_module.apply(variables, inp, train=False)
        loss_vec = self.criterion(resulter['pred'], gt, inp)
        return {self.NAME: (resulter['activated_pred'], loss_vec)}
