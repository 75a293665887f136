"""Semantic-segmentation criterion (reference: task/sseg/criterion.py:18-38).

Per-sample cross entropy with ignore_index, matching torch's
``CrossEntropyLoss(ignore_index, reduction='none')`` followed by a mean over
(H, W): ignored pixels contribute 0 to the sum but still count in the
denominator (exactly the reference's ``torch.mean(loss, dim=(1,2))``).
NHWC logits; computed in fp32 regardless of model compute dtype.
"""

import jax
import jax.numpy as jnp

from ...task_template import criterion_template
from ...utils import logger


def add_parser_arguments(parser):
    criterion_template.add_parser_arguments(parser)


def sseg_criterion():
    return CommonSsegCriterion


def cross_entropy_per_sample(logits, gt, ignore_index):
    """[N,H,W,C] logits + [N,H,W] int gt → [N] loss (torch-mean semantics)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = (gt >= 0) & (gt < num_classes) & (gt != ignore_index)
    safe_gt = jnp.clip(gt, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_gt[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return jnp.mean(ce, axis=(1, 2))


class CommonSsegCriterion(criterion_template.TaskCriterion):
    def __call__(self, pred, gt, inp):
        if len(pred) != 1 or len(gt) != 1 or len(inp) != 1:
            logger.log_err('sseg criterion requires len(pred) == len(gt) == '
                           'len(inp) == 1')
        logits, target = pred[0], gt[0]
        if target.ndim == 4:
            target = target[..., 0]
        return cross_entropy_per_sample(logits, target.astype(jnp.int32),
                                        self.args.ignore_index)
