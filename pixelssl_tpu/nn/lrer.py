"""String-keyed learning-rate scheduler registry.

Re-design of the reference's torch lr_scheduler wrappers
(reference: pixelssl/nn/lrer.py:14-179). TPU-first difference: a scheduler
here is a *pure function of the global iteration count* baked into the optax
optimizer at build time, so lr updates happen inside the jitted train step —
no host-side ``.step()`` calls. The reference's epoch-vs-iter distinction
(EPOCH_LRERS step once per epoch, ITER_LRERS every iteration,
lrer.py:14-15,160-179) is preserved exactly: epoch-kind schedules quantize
the step to ``step // iters_per_epoch`` so the lr changes at epoch
boundaries, matching per-epoch ``.step()`` semantics.
"""

import jax.numpy as jnp

from ..utils import cmd, logger

EPOCH_LRERS = ['steplr', 'multisteplr', 'exponentiallr', 'cosineannealinglr']
ITER_LRERS = ['polynomiallr']
VALID_LRER = EPOCH_LRERS + ITER_LRERS


def add_parser_arguments(parser):
    """LR-scheduler flags — names match reference lrer.py:28-43."""
    parser.add_argument('--last-epoch', type=int, default=-1, metavar='',
                        help='lrer - index of last epoch (resume)')
    parser.add_argument('--step-size', type=int, default=-1, metavar='',
                        help='lrer - period of lr decay (steplr)')
    parser.add_argument('--milestones', type=cmd.str2intlist, default=[], metavar='',
                        help='lrer - epoch milestones (multisteplr)')
    parser.add_argument('--gamma', type=float, default=-1, metavar='',
                        help='lrer - multiplicative decay factor')
    parser.add_argument('--T-max', type=int, default=-1, metavar='',
                        help='lrer - max iteration count (cosineannealinglr)')
    parser.add_argument('--eta-min', type=float, default=-1, metavar='',
                        help='lrer - minimum lr (cosineannealinglr)')
    parser.add_argument('--power', type=float, default=-1, metavar='',
                        help='lrer - polynomial decay power (polynomiallr)')


def _default(value, default):
    return default if value is None or value == -1 else value


class LRSchedulerFactory(object):
    """Deferred schedule constructor bound to parsed args.

    ``make(base_lr, iters_per_epoch, total_epochs)`` returns a pure
    ``schedule(step) -> lr`` suitable for optax.
    """

    def __init__(self, name, kind, build_fn):
        self.name = name
        self.kind = kind  # 'epoch' | 'iter'
        self._build_fn = build_fn

    @property
    def is_epoch_lrer(self):
        return self.kind == 'epoch'

    def make(self, base_lr, iters_per_epoch, total_epochs):
        return self._build_fn(base_lr, iters_per_epoch, total_epochs)


def steplr(args):
    """lr = base * gamma^(epoch // step_size) (reference lrer.py:51-66)."""
    step_size = _default(args.step_size, None)
    gamma = _default(args.gamma, 0.1)
    if step_size is None:
        logger.log_err('steplr requires --step-size')

    def build(base_lr, iters_per_epoch, total_epochs):
        def schedule(step):
            epoch = step // iters_per_epoch
            return base_lr * gamma ** (epoch // step_size)
        return schedule

    return LRSchedulerFactory('steplr', 'epoch', build)


def multisteplr(args):
    """lr = base * gamma^(#milestones passed) (reference lrer.py:69-84)."""
    milestones = list(args.milestones or [])
    gamma = _default(args.gamma, 0.1)
    if not milestones:
        logger.log_err('multisteplr requires --milestones')

    def build(base_lr, iters_per_epoch, total_epochs):
        boundaries = jnp.asarray(milestones)

        def schedule(step):
            epoch = step // iters_per_epoch
            n_passed = jnp.sum(epoch >= boundaries)
            return base_lr * gamma ** n_passed
        return schedule

    return LRSchedulerFactory('multisteplr', 'epoch', build)


def exponentiallr(args):
    """lr = base * gamma^epoch (reference lrer.py:87-100)."""
    gamma = _default(args.gamma, None)
    if gamma is None:
        logger.log_err('exponentiallr requires --gamma')

    def build(base_lr, iters_per_epoch, total_epochs):
        def schedule(step):
            epoch = step // iters_per_epoch
            return base_lr * gamma ** epoch
        return schedule

    return LRSchedulerFactory('exponentiallr', 'epoch', build)


def cosineannealinglr(args):
    """Cosine annealing over T_max epochs (reference lrer.py:103-119)."""
    eta_min = _default(args.eta_min, 0.0)
    t_max = _default(args.T_max, None)

    def build(base_lr, iters_per_epoch, total_epochs):
        T = t_max if t_max is not None else total_epochs

        def schedule(step):
            epoch = step // iters_per_epoch
            return eta_min + 0.5 * (base_lr - eta_min) * (
                1.0 + jnp.cos(jnp.pi * epoch / T))
        return schedule

    return LRSchedulerFactory('cosineannealinglr', 'epoch', build)


def polynomiallr(args):
    """lr = base * (1 - iter/max_iters)^power, per-iteration
    (reference lrer.py:143-179: the only ITER_LRER; used by every
    benchmark script)."""
    power = _default(args.power, 0.9)

    def build(base_lr, iters_per_epoch, total_epochs):
        max_iters = max(1, iters_per_epoch * total_epochs)

        def schedule(step):
            frac = jnp.clip(1.0 - step / max_iters, 0.0, 1.0)
            return base_lr * frac ** power
        return schedule

    return LRSchedulerFactory('polynomiallr', 'iter', build)


_REGISTRY = {
    'steplr': steplr,
    'multisteplr': multisteplr,
    'exponentiallr': exponentiallr,
    'cosineannealinglr': cosineannealinglr,
    'polynomiallr': polynomiallr,
}


def get(name):
    if name not in _REGISTRY:
        logger.log_err('Unknown lrer `{0}`. Valid: {1}'.format(name, VALID_LRER))
    return _REGISTRY[name]
