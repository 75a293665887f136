"""Task criterion contract (reference: pixelssl/task_template/criterion.py:18-78).

A criterion is a **pure function** ``(pred_tuple, gt_tuple, inp_tuple) ->
per-sample 1-D loss [batch]``. The per-sample granularity is the load-bearing
part of the contract (reference criterion.py:62-75): SSL algorithms mask and
split the loss vector along the labeled/unlabeled boundary without knowing
anything about the task.
"""


def add_parser_arguments(parser):
    pass


class TaskCriterion(object):
    """Callable criterion bound to parsed args.

    Subclasses implement ``__call__(pred, gt, inp) -> [batch]`` with jnp ops
    only (it is traced into the fused train step).
    """

    def __init__(self, args):
        self.args = args

    def __call__(self, pred, gt, inp):
        raise NotImplementedError
