"""AdvSSL — adversarial semi-supervised learning (reference:
pixelssl/ssl_algorithm/ssl_adv.py).

    Hung et al., "Adversarial Learning for Semi-supervised Semantic
    Segmentation", BMVC'18.

Semantics preserved:

* task model + FCDiscriminator; D uses its own Adam(β=0.9,0.99) with a
  per-iteration PolynomialLR (ssl_adv.py:101-108,276) and its lr scales with
  the device count (ssl_adv.py:72);
* step-1 trains the task model: supervised CE on labeled + adversarial loss
  pushing D's confidence map toward "real" on labeled (ignore-masked) and
  unlabeled preds (ssl_adv.py:163-188);
* step-2 trains D: fake = detached activated preds (labeled slice, or full
  batch with --unlabeled-for-discriminator), real = one-hot GT;
  d_loss = scale·(fake + real)/2 (ssl_adv.py:203-244);
* the one-hot conversion and ignore-masking run through the task hooks
  (ssladv_convert_task_gt_to_fcd_input / ssladv_preprocess_fcd_criterion).

TPU-first: the reference runs 3 DataParallel rounds (task fwd, D fwd on
fake, D fwd on real) plus two backward/step pairs per iteration; here both
models' forwards, both losses, both gradient pmeans and both optimizer
updates fuse into ONE jitted step. The GT one-hot (host numpy in the
reference, task/sseg/func.py:158-168) is a device one_hot.
"""

import jax
import jax.numpy as jnp
import optax

from ..models.discriminator import FCDiscriminator, fc_discriminator_criterion
from ..nn.func import split_tensor_tuple
from ..utils import cmd, logger
from ..utils.constant import REGRESSION, CLASSIFICATION
from ..task_template.model import check_resulter
from .ssl_base import SSLBase, TaskContext, aux_compute_dtype


def add_parser_arguments(parser):
    """Flags match reference ssl_adv.py:28-38."""
    parser.add_argument('--adv-for-labeled', type=cmd.str2bool, default=False,
                        help='ssladv - adversarial constraint on labeled data')
    parser.add_argument('--labeled-adv-scale', type=float, default=-1,
                        help='ssladv - labeled adversarial coefficient')
    parser.add_argument('--unlabeled-adv-scale', type=float, default=-1,
                        help='ssladv - unlabeled adversarial coefficient')
    parser.add_argument('--discriminator-lr', type=float, default=1e-4,
                        help='ssladv - initial lr of the FC discriminator')
    parser.add_argument('--discriminator-power', type=float, default=0.9,
                        help='ssladv - PolynomialLR power for the discriminator')
    parser.add_argument('--unlabeled-for-discriminator', type=cmd.str2bool,
                        default=False,
                        help='ssladv - train D with unlabeled data too')
    parser.add_argument('--discriminator-scale', type=float, default=1.0,
                        help='ssladv - D loss coefficient')


def ssl_adv(args, model_dict, optimizer_dict, lrer_dict, criterion_dict,
            task_func, **ctx_kwargs):
    if not len(model_dict) == len(optimizer_dict) == len(lrer_dict) == len(criterion_dict) == 1:
        logger.log_err('ssl_adv requires exactly one model/optimizer/lrer/criterion')
    if list(model_dict.keys()) != ['model']:
        logger.log_err('ssl_adv requires component dicts keyed `model`')
    ctx = TaskContext(args, model_dict, optimizer_dict, lrer_dict,
                      criterion_dict, task_func, **ctx_kwargs)
    return SSLADV(args, ctx)


class SSLADV(SSLBase):
    NAME = 'ssl_adv'
    SUPPORTED_TASK_TYPES = [REGRESSION, CLASSIFICATION]

    def __init__(self, args, ctx):
        super(SSLADV, self).__init__(args, ctx)
        # hyperparameter validation (reference ssl_adv.py:74-86)
        if args.adv_for_labeled and args.labeled_adv_scale < 0:
            logger.log_err('ssl_adv requires --labeled-adv-scale >= 0 when '
                           '--adv-for-labeled is set')
        if (ctx.ubs_local or 0) > 0 and args.unlabeled_adv_scale < 0:
            logger.log_err('ssl_adv requires --unlabeled-adv-scale >= 0 when '
                           'unlabeled data is used')

        self.model = ctx.models['model']
        self.criterion = ctx.criterions['model']
        opt = ctx.optimizers['model']
        self.lr_schedule = ctx.lrers['model'].make(opt.base_lr,
                                                   ctx.iters_per_epoch,
                                                   args.epochs)
        self._opt_factory = opt

        # discriminator lr scales with device count (reference ssl_adv.py:72)
        d_lr = args.discriminator_lr * ctx.n_dev
        max_iters = max(1, ctx.iters_per_epoch * args.epochs)
        self.d_lr_schedule = lambda step: d_lr * jnp.clip(
            1.0 - step / max_iters, 0.0, 1.0) ** args.discriminator_power
        self.d_module = FCDiscriminator(dtype=aux_compute_dtype(args))

    def _build_state(self, rng):
        k_m, k_d = jax.random.split(rng)
        variables = self.model.init(k_m, self.ctx.example_inp)
        params = variables['params']
        self.tx = self._opt_factory.make(self.lr_schedule,
                                         self.model.lr_mult(params))

        fcd_in = self.ctx.task_func.ssladv_fcd_in_channels()
        im = self.ctx.example_inp[0].shape[1:3]
        local_b = self.ctx.example_inp[0].shape[0]
        d_example = jnp.zeros((local_b,) + im + (fcd_in,), jnp.float32)
        d_params = self.d_module.init(k_d, d_example)['params']
        self.d_tx = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99),
            optax.scale_by_learning_rate(self.d_lr_schedule))

        return {
            'model': {'params': params,
                      'batch_stats': variables.get('batch_stats', {})},
            'd_model': {'params': d_params},
            'opt': self.tx.init(params),
            'd_opt': self.d_tx.init(d_params),
        }

    def _step_fn(self, state, batch):
        args = self.args
        ctx = self.ctx
        task_func = ctx.task_func
        inp, gt = batch['inp'], batch['gt']
        lbs = ctx.lbs_local
        ubs = ctx.ubs_local or 0
        bs = lbs + ubs
        l_gt = split_tensor_tuple(gt, 0, lbs)

        d_params_fixed = state['d_model']['params']

        # ------------------------------------------------------------------
        # step-1: task model (D frozen)
        # ------------------------------------------------------------------
        def task_loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state['model']['batch_stats']}
            resulter, mutated = self.model.apply(variables, inp, train=True)
            check_resulter(resulter)
            pred = resulter['pred']
            activated_pred = resulter['activated_pred']

            confidence_map = self.d_module.apply(
                {'params': d_params_fixed}, activated_pred[0])

            l_pred = split_tensor_tuple(pred, 0, lbs)
            l_inp = split_tensor_tuple(inp, 0, lbs)
            task_loss = self._global_mean(self.criterion(l_pred, l_gt, l_inp))

            if args.adv_for_labeled:
                cm, cgt = task_func.ssladv_preprocess_fcd_criterion(
                    confidence_map[:lbs], l_gt[0], True)
                labeled_adv = args.labeled_adv_scale * self._global_mean(
                    fc_discriminator_criterion(cm, cgt))
            else:
                labeled_adv = jnp.zeros((), jnp.float32)

            if ubs > 0:
                cm, cgt = task_func.ssladv_preprocess_fcd_criterion(
                    confidence_map[lbs:bs], None, True)
                unlabeled_adv = args.unlabeled_adv_scale * self._global_mean(
                    fc_discriminator_criterion(cm, cgt))
            else:
                unlabeled_adv = jnp.zeros((), jnp.float32)

            loss = task_loss + labeled_adv + unlabeled_adv
            return loss, (mutated, activated_pred, task_loss,
                          labeled_adv, unlabeled_adv)

        (_, (mutated, activated_pred, task_loss, labeled_adv, unlabeled_adv)), \
            grads = jax.value_and_grad(task_loss_fn, has_aux=True)(
                state['model']['params'])
        grads = self._pmean(grads)
        params, opt_state = self._apply_updates(
            self.tx, state['model']['params'], grads, state['opt'])

        # ------------------------------------------------------------------
        # step-2: discriminator (task preds detached)
        # ------------------------------------------------------------------
        fake_inp = jax.lax.stop_gradient(activated_pred[0])

        # real branch zero-padded to the FULL batch: every D call in the
        # program then runs at one batch size. Running the discriminator at
        # two different batch sizes in one compiled program triggers a fatal
        # XLA TPU space-to-batch compiler bug on the backprop-filter convs
        # (Check failed: PropagateOnBackpropFilterConv, select shape
        # mismatch); padded rows are excluded from the loss, so the math is
        # the reference's exactly.
        real_gt_inp = task_func.ssladv_convert_task_gt_to_fcd_input(l_gt[0])
        pad = jnp.zeros((bs - lbs,) + real_gt_inp.shape[1:], real_gt_inp.dtype)
        real_gt_padded = jnp.concatenate([real_gt_inp, pad], axis=0)

        def d_loss_fn(d_params):
            fake_cm = self.d_module.apply({'params': d_params}, fake_inp)
            l_cm, l_cgt = task_func.ssladv_preprocess_fcd_criterion(
                fake_cm[:lbs], l_gt[0], False)
            fake_losses = [fc_discriminator_criterion(l_cm, l_cgt)]
            if args.unlabeled_for_discriminator and ubs > 0:
                u_cm, u_cgt = task_func.ssladv_preprocess_fcd_criterion(
                    fake_cm[lbs:bs], None, False)
                fake_losses.append(fc_discriminator_criterion(u_cm, u_cgt))
            fake_d_loss = args.discriminator_scale * self._global_mean(
                jnp.concatenate(fake_losses, axis=0))

            real_cm = self.d_module.apply({'params': d_params},
                                          real_gt_padded)[:lbs]
            real_cm, real_cgt = task_func.ssladv_preprocess_fcd_criterion(
                real_cm, l_gt[0], True)
            real_d_loss = args.discriminator_scale * self._global_mean(
                fc_discriminator_criterion(real_cm, real_cgt))

            d_loss = (fake_d_loss + real_d_loss) / 2.0
            return d_loss, (fake_d_loss, real_d_loss)

        (_, (fake_d_loss, real_d_loss)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state['d_model']['params'])
        d_grads = self._pmean(d_grads)
        d_updates, d_opt_state = self.d_tx.update(
            d_grads, state['d_opt'], state['d_model']['params'])
        d_params = optax.apply_updates(state['d_model']['params'], d_updates)

        new_state = dict(state)
        new_state['model'] = {'params': params,
                              'batch_stats': mutated.get('batch_stats', {})}
        new_state['d_model'] = {'params': d_params}
        new_state['opt'] = opt_state
        new_state['d_opt'] = d_opt_state
        new_state['step'] = state['step'] + 1

        metrics = {'task_loss': task_loss,
                   'labeled_adv_loss': labeled_adv,
                   'unlabeled_adv_loss': unlabeled_adv,
                   'fake_d_loss': fake_d_loss,
                   'real_d_loss': real_d_loss,
                   'lr': jnp.asarray(self.lr_schedule(state['step']), jnp.float32)}
        return new_state, metrics

    def _eval_fn(self, state, batch):
        inp, gt = batch['inp'], batch['gt']
        variables = {'params': state['model']['params'],
                     'batch_stats': state['model']['batch_stats']}
        resulter, _ = self.model.apply(variables, inp, train=False)
        loss_vec = self.criterion(resulter['pred'], gt, inp)
        return {self.NAME: (resulter['activated_pred'], loss_vec)}

    def _debug_visualize(self, batch, out_path):
        """FC-discriminator confidence maps for the first labeled and first
        unlabeled sample (reference ssl_adv.py:393-408)."""
        from .ssl_base import save_gray_map

        if self._debug_viz_fn is None:
            def fn(state, batch):
                variables = {'params': state['model']['params'],
                             'batch_stats': state['model']['batch_stats']}
                resulter, _ = self.model.apply(variables, batch['inp'],
                                               train=False)
                act = resulter['activated_pred'][0]
                logits = self.d_module.apply(
                    {'params': state['d_model']['params']}, act)
                return jax.nn.sigmoid(logits)
            self._debug_viz_fn = jax.jit(fn)
        cmap = jax.device_get(self._debug_viz_fn(self.state, batch))
        save_gray_map(cmap[:1], out_path + '_labeled-cmap.png')
        ubs = self.ctx.ubs_local or 0
        if ubs > 0:  # first unlabeled sample of device 0's labeled-first block
            u0 = self.ctx.lbs_local
            save_gray_map(cmap[u0:u0 + 1], out_path + '_unlabeled-cmap.png')
