"""Task model contract (reference: pixelssl/task_template/model.py:17-85).

A task model in the TPU rebuild is a **flax module plus metadata**, not a
stateful wrapper: the module's ``__call__(inp_tuple, train)`` must return a
``resulter`` dict with at least

* ``'pred'``            — tuple of raw logits/outputs,
* ``'activated_pred'``  — tuple of activated outputs,

plus optional algorithm-specific keys (``'ssls4l_rc_inp'``,
``'sslcct_ad_inp'`` — reference task/sseg/model.py:61-64). The reference's
``param_groups`` lr-scaling lists (model.py:54, task/sseg/model.py:45-48)
become ``lr_mult(params)``: a pytree of per-leaf multipliers consumed by the
optimizer registry.
"""

import jax
import jax.numpy as jnp

from ..utils import logger


def add_parser_arguments(parser):
    pass


class TaskModel(object):
    """Bundles a flax module with its param-group policy.

    Subclasses (one per concrete task model) must set ``self.module`` in
    ``__init__`` and may override ``lr_mult_spec`` — a list of
    ``(path_substring, multiplier)`` rules applied to flattened param paths
    (first match wins, default 1.0).
    """

    lr_mult_spec = ()

    def __init__(self, args):
        self.args = args
        self.module = None

    def init(self, rng, example_inp):
        """Initialize flax variables ({'params', 'batch_stats', ...}), then
        load a converted pretrained checkpoint when --pretrained-path is set
        (the reference loads torch backbones at build time,
        task/sseg/module/backbone/resnet.py:145-156)."""
        variables = self.module.init(rng, example_inp, train=False)
        path = getattr(self.args, 'pretrained_path', '') if self.args else ''
        if path:
            variables = self.load_pretrained(variables, path)
        return variables

    def load_pretrained(self, variables, path):
        """Default: treat the file as a torch ResNet backbone checkpoint.
        Task models override to dispatch full-model converters."""
        from ..models.convert import load_pretrained_backbone
        return load_pretrained_backbone(variables, path)

    def apply(self, variables, inp, train, rngs=None):
        """Forward pass. Returns (resulter, mutated_model_state)."""
        if train:
            resulter, mutated = self.module.apply(
                variables, inp, train=True, mutable=['batch_stats'], rngs=rngs)
            return resulter, mutated
        resulter = self.module.apply(variables, inp, train=False, rngs=rngs)
        return resulter, {}

    def lr_mult(self, params):
        """Per-leaf lr multiplier pytree from ``lr_mult_spec`` path rules."""
        spec = self.lr_mult_spec

        def leaf_mult(path, leaf):
            path_str = '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                                for k in path)
            for substr, mult in spec:
                if substr in path_str:
                    return jnp.asarray(mult, jnp.float32)
            return jnp.asarray(1.0, jnp.float32)

        return jax.tree_util.tree_map_with_path(leaf_mult, params)


def check_resulter(resulter, keys=('pred', 'activated_pred')):
    for k in keys:
        if k not in resulter:
            logger.log_err(
                'Task model resulter is missing required key `{0}`\n'
                'The task model must follow the resulter contract '
                '(see task_template/model.py)'.format(k))
