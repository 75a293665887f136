"""Pixel-regression criterion: per-sample masked MSE on the activated
(sigmoid) prediction, following the 1-D per-sample contract
(task_template/criterion.py; reference: pixelssl/task_template/
criterion.py:62-75).

Pixels whose GT equals ``--ignore-index`` are excluded — the validation
loader marks spatial padding and padded tail samples by filling GT with
that value (task_template/proxy.py:_ValLoader), the same convention the
sseg cross entropy uses.
"""

import jax
import jax.numpy as jnp

from ...task_template import criterion_template
from ...utils import logger


def add_parser_arguments(parser):
    criterion_template.add_parser_arguments(parser)


def sreg_criterion():
    return MaskedMseCriterion


def mse_per_sample(pred, gt, ignore_index):
    """[N,H,W,1] sigmoid-activated pred + [N,H,W,1] float gt → [N]."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    valid = (gt != ignore_index).astype(jnp.float32)
    se = jnp.square(pred - gt) * valid
    denom = jnp.maximum(jnp.sum(valid, axis=(1, 2, 3)), 1.0)
    return jnp.sum(se, axis=(1, 2, 3)) / denom


class MaskedMseCriterion(criterion_template.TaskCriterion):
    def __call__(self, pred, gt, inp):
        if len(pred) != 1 or len(gt) != 1 or len(inp) != 1:
            logger.log_err('sreg criterion requires len(pred) == len(gt) == '
                           'len(inp) == 1')
        out = jnp.asarray(pred[0], jnp.float32)
        return mse_per_sample(jax.nn.sigmoid(out), gt[0],
                              self.args.ignore_index)
