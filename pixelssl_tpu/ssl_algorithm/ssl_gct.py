"""GCT — Guided Collaborative Training (reference:
pixelssl/ssl_algorithm/ssl_gct.py).

    Ke et al., "Guided Collaborative Training for Pixel-wise
    Semi-Supervised Learning", ECCV'20 (the toolbox authors' own method).

Semantics preserved:

* two task models (same or different arch, 1- or 2-key component dicts,
  ssl_gct.py:58-82) + one FlawDetector with its own Adam(0.9,0.99) and a
  per-iteration PolynomialLR; fd lr scales with device count
  (ssl_gct.py:107,153-160,289);
* 3-phase iteration (ssl_gct.py:176-298):
  step-0 — no-grad pre-forward of both models, FD forwards on their
  activated preds, FlawmapHandler post-processing + DCGT generation for the
  dynamic-consistency pseudo-GT (gct/dc modes);
  step-1 — each model trained with sup CE + flaw-correction (per-pixel
  MSE of its flawmap vs 0, masked by the both-bad mask in gct mode) +
  ramped dynamic-consistency MSE vs dc_gt, with FD frozen;
  step-2 — FD trained on the labeled slice of the step-0 flawmaps vs the
  FDGT pipeline output, loss (l+r)/2;
* FlawmapHandler: clamp≥0 → blur(k=im/16) → zero-if-max≤0.1 → min-max
  normalize (ssl_gct.py:624-657); DCGTGenerator thresholded flawmap
  comparison (ssl_gct.py:660-689); FDGTGenerator |gt−pred|·μ summed over C
  → blur(k/8) → ν×[dilate+reblur(k/4)] → normalize (ssl_gct.py:692-728).

TPU-first: the reference issues ≥7 DataParallel scatter/gather rounds per
iteration — the single worst launch profile in the toolbox; here all three
phases (6 model forwards, 3 gradient computations, 3 optimizer updates and
all blur/dilate pipelines) fuse into ONE jitted step, with `stop_gradient`
replacing the requires_grad toggling (ssl_gct.py:229-248).
"""

import jax
import jax.numpy as jnp
import optax

from ..models.flaw_detector import FlawDetector, flaw_detector_criterion
from ..nn.func import sigmoid_rampup, split_tensor_tuple
# blur via the banded-matrix matmul formulation (ops/blur_pallas.py,
# einsum path): the conv lowering runs these single-channel maps at
# ~1/128 MXU lane utilization; the matmul form is test-equal
# (tests/test_ops.py:test_fused_blur_matches_conv_blur) and measurably
# faster inside the fused GCT step (BASELINE.md)
from ..ops.blur_pallas import gaussian_blur_fused as _blur
from ..utils import logger
from ..utils.constant import REGRESSION, CLASSIFICATION
from .ssl_base import SSLBase, TaskContext, aux_compute_dtype

MODE_GCT = 'gct'
MODE_FC = 'fc'
MODE_DC = 'dc'


def add_parser_arguments(parser):
    """Flags match reference ssl_gct.py:36-52."""
    parser.add_argument('--ssl-mode', type=str, default=MODE_GCT,
                        choices=[MODE_GCT, MODE_DC, MODE_FC],
                        help='sslgct - constraint selection (gct = dc + fc)')
    parser.add_argument('--fc-ssl-scale', type=float, default=-1.0,
                        help='sslgct - flaw correction coefficient')
    parser.add_argument('--dc-ssl-scale', type=float, default=-1.0,
                        help='sslgct - dynamic consistency coefficient')
    parser.add_argument('--dc-threshold', type=float, default=-1.0,
                        help='sslgct - dynamic consistency threshold')
    parser.add_argument('--dc-rampup-epochs', type=int, default=-1,
                        help='sslgct - dynamic consistency ramp-up epochs')
    parser.add_argument('--fd-lr', type=float, default=1e-4,
                        help='sslgct - initial flaw-detector lr')
    parser.add_argument('--fd-scale', type=float, default=1.0,
                        help='sslgct - flaw-detector loss coefficient')
    parser.add_argument('--mu', type=float, default=-1.0,
                        help='sslgct - FDGT channel average coefficient')
    parser.add_argument('--nu', type=int, default=-1,
                        help='sslgct - FDGT dilate/reblur repeats')


def ssl_gct(args, model_dict, optimizer_dict, lrer_dict, criterion_dict,
            task_func, **ctx_kwargs):
    if not len(model_dict) == len(optimizer_dict) == len(lrer_dict) == len(criterion_dict):
        logger.log_err('ssl_gct component dicts must have equal length')
    if len(model_dict) == 1:
        if list(model_dict.keys()) != ['model']:
            logger.log_err('ssl_gct 1-key component dicts must be keyed `model`')
        keys = ('model', 'model')
    elif len(model_dict) == 2:
        if set(model_dict.keys()) != {'lmodel', 'rmodel'}:
            logger.log_err('ssl_gct 2-key component dicts must be keyed '
                           '(lmodel, rmodel)')
        keys = ('lmodel', 'rmodel')
    else:
        logger.log_err('ssl_gct supports component dicts with 1 or 2 keys')
    ctx = TaskContext(args, model_dict, optimizer_dict, lrer_dict,
                      criterion_dict, task_func, **ctx_kwargs)
    return SSLGCT(args, ctx, keys)


# ---------------------------------------------------------------------------
# pure pipeline functions (reference ssl_gct.py:624-728) — NHWC maps [N,H,W,1]
# ---------------------------------------------------------------------------

def _odd(k):
    return k + 1 if k % 2 == 0 else k


def _minmax_normalize(x):
    xmax = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    xmin = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    return (x - xmin) / (xmax - xmin + 1e-9), xmin, xmax


def flawmap_handler(flawmap, im_size, clip_threshold=0.1):
    """Reference ssl_gct.py:624-657 — op order preserved exactly (the
    min-max normalization uses the pre-clip fmin/fmax)."""
    fm = jax.lax.stop_gradient(flawmap.astype(jnp.float32))
    fm = fm * (fm >= 0).astype(jnp.float32)
    fm = _blur(fm, _odd(int(im_size / 16)))
    fmax = jnp.max(fm, axis=(1, 2, 3), keepdims=True)
    fmin = jnp.min(fm, axis=(1, 2, 3), keepdims=True)
    fm = fm * (fmax > clip_threshold).astype(jnp.float32)
    return (fm - fmin) / (fmax - fmin + 1e-9)


def dcgt_generator(l_pred, r_pred, l_flawmap, r_flawmap, dc_threshold):
    """Reference ssl_gct.py:660-689: per-pixel pick of the better model's
    activated pred as the other's pseudo-GT; bad pixels (>threshold) are
    promoted to 1.0 before comparison; fc_mask = both-bad."""
    l_bad = l_flawmap > dc_threshold
    r_bad = r_flawmap > dc_threshold
    both_bad = (l_bad & r_bad).astype(jnp.float32)

    l_h = jnp.where(l_bad, 1.0, l_flawmap)
    r_h = jnp.where(r_bad, 1.0, r_flawmap)

    l_mask = (r_h >= l_h).astype(jnp.float32)
    r_mask = (l_h >= r_h).astype(jnp.float32)
    l_dc_gt = l_mask * l_pred + (1.0 - l_mask) * r_pred
    r_dc_gt = r_mask * r_pred + (1.0 - r_mask) * l_pred
    return l_dc_gt, r_dc_gt, both_bad, both_bad


def _dilate3x3(x):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
    return jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 1, 1, 1), 'VALID')


def fdgt_generator(pred, gt_encoded, im_size, mu, nu):
    """Reference ssl_gct.py:692-728: FD ground-truth pipeline."""
    diff = jnp.abs(gt_encoded.astype(jnp.float32) -
                   jax.lax.stop_gradient(pred.astype(jnp.float32)))
    diff = jnp.sum(diff, axis=-1, keepdims=True) * mu
    diff = _blur(diff, _odd(int(im_size / 8)))
    for _ in range(int(nu)):
        diff = _blur(_dilate3x3(diff), _odd(int(im_size / 4)))
    out, _, _ = _minmax_normalize(diff)
    return out


class SSLGCT(SSLBase):
    NAME = 'ssl_gct'
    SUPPORTED_TASK_TYPES = [REGRESSION, CLASSIFICATION]

    def __init__(self, args, ctx, keys):
        super(SSLGCT, self).__init__(args, ctx)
        self.l_key, self.r_key = keys

        # hyperparameter validation (reference ssl_gct.py:110-134)
        if (ctx.ubs_local or 0) > 0:
            if args.ssl_mode in (MODE_GCT, MODE_FC) and args.fc_ssl_scale < 0:
                logger.log_err('ssl_gct requires --fc-ssl-scale >= 0')
            if args.ssl_mode in (MODE_GCT, MODE_DC):
                if args.dc_rampup_epochs < 0:
                    logger.log_err('ssl_gct requires --dc-rampup-epochs >= 0')
                if args.dc_ssl_scale < 0:
                    logger.log_err('ssl_gct requires --dc-ssl-scale >= 0')
                if args.dc_threshold < 0:
                    logger.log_err('ssl_gct requires --dc-threshold >= 0')
                if args.mu < 0:
                    logger.log_err('ssl_gct requires 0 < --mu <= 1')
                if args.nu < 0:
                    logger.log_err('ssl_gct requires --nu > 0')

        self.l_model = ctx.models[self.l_key]
        self.r_model = ctx.models[self.r_key]
        self.l_criterion = ctx.criterions[self.l_key]
        self.r_criterion = ctx.criterions[self.r_key]
        l_opt = ctx.optimizers[self.l_key]
        r_opt = ctx.optimizers[self.r_key]
        self.l_lr_schedule = ctx.lrers[self.l_key].make(
            l_opt.base_lr, ctx.iters_per_epoch, args.epochs)
        self.r_lr_schedule = ctx.lrers[self.r_key].make(
            r_opt.base_lr, ctx.iters_per_epoch, args.epochs)
        self._l_opt_factory, self._r_opt_factory = l_opt, r_opt

        fd_lr = args.fd_lr * ctx.n_dev  # reference ssl_gct.py:107
        max_iters = max(1, ctx.iters_per_epoch * args.epochs)
        self.fd_lr_schedule = lambda step: fd_lr * jnp.clip(
            1.0 - step / max_iters, 0.0, 1.0) ** 0.9
        self.fd_module = FlawDetector(axis_name=ctx.axis_name,
                                      dtype=aux_compute_dtype(args))

    def _build_state(self, rng):
        k_l, k_r, k_fd = jax.random.split(rng, 3)
        example = self.ctx.example_inp
        l_vars = self.l_model.init(k_l, example)
        r_vars = self.r_model.init(k_r, example)
        self.l_tx = self._l_opt_factory.make(
            self.l_lr_schedule, self.l_model.lr_mult(l_vars['params']))
        self.r_tx = self._r_opt_factory.make(
            self.r_lr_schedule, self.r_model.lr_mult(r_vars['params']))

        # pred channels derived from the same task hook that sizes the flaw
        # detector (reference ssl_gct.py builds FlawDetector from
        # task_func.sslgct_fd_in_channels()) — keeps GCT task-agnostic
        # (works for REGRESSION tasks with no `num_classes` flag)
        pred_ch = (int(self.ctx.task_func.sslgct_fd_in_channels())
                   - int(example[0].shape[-1]))
        local_b = example[0].shape[0]
        im = example[0].shape[1:3]
        fd_example_pred = jnp.zeros((local_b,) + im + (pred_ch,),
                                    jnp.float32)
        fd_vars = self.fd_module.init(k_fd, tuple(map(jnp.asarray, example)),
                                      fd_example_pred, train=False)
        self.fd_tx = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99),
            optax.scale_by_learning_rate(self.fd_lr_schedule))

        return {
            'l_model': {'params': l_vars['params'],
                        'batch_stats': l_vars.get('batch_stats', {})},
            'r_model': {'params': r_vars['params'],
                        'batch_stats': r_vars.get('batch_stats', {})},
            'fd_model': {'params': fd_vars['params'],
                         'batch_stats': fd_vars.get('batch_stats', {})},
            'l_opt': self.l_tx.init(l_vars['params']),
            'r_opt': self.r_tx.init(r_vars['params']),
            'fd_opt': self.fd_tx.init(fd_vars['params']),
        }

    # ------------------------------------------------------------------

    def _fd_apply(self, fd_state, inp, pred, train=True):
        variables = {'params': fd_state['params'],
                     'batch_stats': fd_state['batch_stats']}
        if train:
            flawmap, mutated = self.fd_module.apply(
                variables, inp, pred, train=True, mutable=['batch_stats'])
            return flawmap, mutated['batch_stats']
        return self.fd_module.apply(variables, inp, pred, train=False), \
            fd_state['batch_stats']

    def _step_fn(self, state, batch):
        args = self.args
        ctx = self.ctx
        task_func = ctx.task_func
        inp, gt = batch['inp'], batch['gt']
        lbs = ctx.lbs_local
        im_size = inp[0].shape[1]

        cur_step = state['step'].astype(jnp.float32)
        total = float(ctx.iters_per_epoch * max(args.dc_rampup_epochs, 0))
        dc_rampup = sigmoid_rampup(cur_step, total)

        metrics = {}

        # ------------------------------------------------------------------
        # step-0: no-grad pre-forward (BN stats DO update, matching torch
        # train() mode under no_grad)
        # ------------------------------------------------------------------
        def preforward(mstate, model):
            variables = {'params': mstate['params'],
                         'batch_stats': mstate['batch_stats']}
            resulter, mutated = model.apply(variables, inp, train=True)
            act = jax.lax.stop_gradient(resulter['activated_pred'][0])
            return act, mutated.get('batch_stats', {})

        l_act0, l_bs0 = preforward(state['l_model'], self.l_model)
        r_act0, r_bs0 = preforward(state['r_model'], self.r_model)

        fd_bs = state['fd_model']['batch_stats']
        l_flawmap0, fd_bs = self._fd_apply(
            {'params': state['fd_model']['params'], 'batch_stats': fd_bs},
            inp, l_act0)
        r_flawmap0, fd_bs = self._fd_apply(
            {'params': state['fd_model']['params'], 'batch_stats': fd_bs},
            inp, r_act0)

        l_dc_gt = r_dc_gt = l_fc_mask = r_fc_mask = None
        if args.ssl_mode in (MODE_GCT, MODE_DC):
            l_handled = flawmap_handler(l_flawmap0, im_size)
            r_handled = flawmap_handler(r_flawmap0, im_size)
            l_dc_gt, r_dc_gt, l_fc_mask, r_fc_mask = dcgt_generator(
                l_act0, r_act0, l_handled, r_handled, args.dc_threshold)

        # ------------------------------------------------------------------
        # step-1: task models (FD params frozen via closure)
        # ------------------------------------------------------------------
        fd_params_fixed = state['fd_model']['params']

        def task_iter(mid, model, criterion, mstate, bstats_in, dc_gt, fc_mask,
                      fd_bstats):
            def loss_fn(params):
                variables = {'params': params, 'batch_stats': bstats_in}
                resulter, mutated = model.apply(variables, inp, train=True)
                pred = resulter['pred']
                act = resulter['activated_pred'][0]

                flawmap, fd_bs_out = self._fd_apply(
                    {'params': fd_params_fixed, 'batch_stats': fd_bstats},
                    inp, act)

                task_loss = self._global_mean(criterion(
                    split_tensor_tuple(pred, 0, lbs),
                    split_tensor_tuple(gt, 0, lbs),
                    split_tensor_tuple(inp, 0, lbs)))

                if args.ssl_mode in (MODE_GCT, MODE_FC):
                    fc = flaw_detector_criterion(
                        flawmap, jnp.zeros_like(flawmap), reduction=False)
                    if args.ssl_mode == MODE_GCT:
                        fc = fc_mask * fc
                    fc_loss = args.fc_ssl_scale * self._global_mean(
                        jnp.mean(fc, axis=(1, 2, 3)))
                else:
                    fc_loss = jnp.zeros((), jnp.float32)

                if args.ssl_mode in (MODE_GCT, MODE_DC):
                    dc = jnp.mean(jnp.square(act.astype(jnp.float32) -
                                             dc_gt.astype(jnp.float32)),
                                  axis=(1, 2, 3))
                    dc_loss = (dc_rampup * args.dc_ssl_scale *
                               self._global_mean(dc))
                else:
                    dc_loss = jnp.zeros((), jnp.float32)

                loss = task_loss + fc_loss + dc_loss
                return loss, (mutated.get('batch_stats', {}), fd_bs_out,
                              task_loss, fc_loss, dc_loss)

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                mstate['params'])
            bstats_out, fd_bs_out, task_loss, fc_loss, dc_loss = aux
            grads = self._pmean(grads)
            metrics['{0}_task_loss'.format(mid)] = task_loss
            metrics['{0}_fc_loss'.format(mid)] = fc_loss
            metrics['{0}_dc_loss'.format(mid)] = dc_loss
            return grads, bstats_out, fd_bs_out

        l_grads, l_bs1, fd_bs = task_iter(
            'l', self.l_model, self.l_criterion, state['l_model'], l_bs0,
            l_dc_gt, l_fc_mask, fd_bs)
        l_params, l_opt = self._apply_updates(
            self.l_tx, state['l_model']['params'], l_grads, state['l_opt'])

        r_grads, r_bs1, fd_bs = task_iter(
            'r', self.r_model, self.r_criterion, state['r_model'], r_bs0,
            r_dc_gt, r_fc_mask, fd_bs)
        r_params, r_opt = self._apply_updates(
            self.r_tx, state['r_model']['params'], r_grads, state['r_opt'])

        # ------------------------------------------------------------------
        # step-2: flaw detector on the labeled slice
        # ------------------------------------------------------------------
        l_inp_lab = split_tensor_tuple(inp, 0, lbs)
        l_fdgt = fdgt_generator(
            l_act0[:lbs], task_func.sslgct_prepare_task_gt_for_fdgt(gt[0][:lbs]),
            im_size, args.mu, max(args.nu, 0))
        r_fdgt = fdgt_generator(
            r_act0[:lbs], task_func.sslgct_prepare_task_gt_for_fdgt(gt[0][:lbs]),
            im_size, args.mu, max(args.nu, 0))

        def fd_loss_fn(fd_params):
            # recompute the step-0 flawmaps as a function of fd_params (the
            # reference backprops through the step-0 FD forwards)
            fm_l, _ = self._fd_apply(
                {'params': fd_params,
                 'batch_stats': state['fd_model']['batch_stats']}, inp, l_act0)
            fm_r, _ = self._fd_apply(
                {'params': fd_params,
                 'batch_stats': state['fd_model']['batch_stats']}, inp, r_act0)
            l_fd = args.fd_scale * self._global_mean(
                flaw_detector_criterion(fm_l[:lbs], l_fdgt))
            r_fd = args.fd_scale * self._global_mean(
                flaw_detector_criterion(fm_r[:lbs], r_fdgt))
            return (l_fd + r_fd) / 2.0, (l_fd, r_fd)

        (_, (l_fd_loss, r_fd_loss)), fd_grads = jax.value_and_grad(
            fd_loss_fn, has_aux=True)(state['fd_model']['params'])
        fd_grads = self._pmean(fd_grads)
        fd_updates, fd_opt = self.fd_tx.update(fd_grads, state['fd_opt'],
                                               state['fd_model']['params'])
        fd_params = optax.apply_updates(state['fd_model']['params'], fd_updates)

        metrics['l_fd_loss'] = l_fd_loss
        metrics['r_fd_loss'] = r_fd_loss
        metrics['lr'] = jnp.asarray(self.l_lr_schedule(state['step']),
                                    jnp.float32)

        new_state = dict(state)
        new_state['l_model'] = {'params': l_params, 'batch_stats': l_bs1}
        new_state['r_model'] = {'params': r_params, 'batch_stats': r_bs1}
        new_state['fd_model'] = {'params': fd_params, 'batch_stats': fd_bs}
        new_state['l_opt'] = l_opt
        new_state['r_opt'] = r_opt
        new_state['fd_opt'] = fd_opt
        new_state['step'] = state['step'] + 1
        return new_state, metrics

    def _eval_fn(self, state, batch):
        inp, gt = batch['inp'], batch['gt']
        out = {}
        for mid, key, model, criterion in (
                ('l', 'l_model', self.l_model, self.l_criterion),
                ('r', 'r_model', self.r_model, self.r_criterion)):
            variables = {'params': state[key]['params'],
                         'batch_stats': state[key]['batch_stats']}
            resulter, _ = model.apply(variables, inp, train=False)
            loss_vec = criterion(resulter['pred'], gt, inp)
            out[mid] = (resulter['activated_pred'], loss_vec)
        return out

    def _debug_visualize(self, batch, out_path):
        """Flawmaps, FD ground truth and DC pseudo-GT for both task models
        (reference ssl_gct.py:486-499)."""
        from .ssl_base import save_gray_map

        if self._debug_viz_fn is None:
            def fn(state, batch):
                inp, gt = batch['inp'], batch['gt']
                im_size = inp[0].shape[1]
                fd_state = {'params': state['fd_model']['params'],
                            'batch_stats': state['fd_model']['batch_stats']}
                maps, acts = {}, {}
                for mid, key, model in (('l', 'l_model', self.l_model),
                                        ('r', 'r_model', self.r_model)):
                    variables = {'params': state[key]['params'],
                                 'batch_stats': state[key]['batch_stats']}
                    resulter, _ = model.apply(variables, inp, train=False)
                    act = resulter['activated_pred'][0]
                    acts[mid] = act
                    flawmap, _ = self._fd_apply(fd_state, inp, act,
                                                train=False)
                    maps[mid + '_fmap'] = flawmap_handler(flawmap, im_size)
                    gt_enc = self.ctx.task_func.\
                        sslgct_prepare_task_gt_for_fdgt(gt[0])
                    maps[mid + '_fmap_gt'] = fdgt_generator(
                        act, gt_enc, im_size, self.args.mu, self.args.nu)
                if self.args.ssl_mode in (MODE_GCT, MODE_DC):
                    l_dc, r_dc, _, _ = dcgt_generator(
                        acts['l'], acts['r'], maps['l_fmap'], maps['r_fmap'],
                        self.args.dc_threshold)
                    maps['l_dc_gt'], maps['r_dc_gt'] = l_dc, r_dc
                return maps
            self._debug_viz_fn = jax.jit(fn)
        maps = jax.device_get(self._debug_viz_fn(self.state, batch))
        for mid in ('l', 'r'):
            save_gray_map(maps[mid + '_fmap'][:1],
                          out_path + '_{0}-fmap.png'.format(mid))
            save_gray_map(maps[mid + '_fmap_gt'][:1],
                          out_path + '_{0}-fmap-gt.png'.format(mid))
            if mid + '_dc_gt' in maps:
                self.ctx.task_func.visualize_pseudo_gt(
                    maps[mid + '_dc_gt'][:1], out_path, id_str=mid)
