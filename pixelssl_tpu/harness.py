"""Programmatic experiment harness: build algorithms without the proxy/CLI.

Used by benchmarks, the compile-check entry points and tests that need an
algorithm + synthetic batches without touching datasets on disk.
"""

import numpy as np

from . import parallel, runner
from .nn import lrer as nnlrer
from .nn import optimizer as nnoptimizer

_TASK_DEFAULTS = {
    'sseg': {'model': 'deeplabv2', 'criterion': 'sseg_criterion'},
    'sreg': {'model': 'unet_lite', 'criterion': 'sreg_criterion'},
}


def _task_module(task):
    if task == 'sseg':
        from .tasks import sseg
        return sseg
    if task == 'sreg':
        from .tasks import sreg
        return sreg
    raise ValueError('Unknown task: {0!r}'.format(task))


def default_args(ssl_algorithm='ssl_null', task='sseg', **overrides):
    """Full-default args namespace for the given task + algorithm."""
    parser = runner.create_parser(ssl_algorithm)
    _task_module(task).add_parser_arguments(parser)
    args = parser.parse_args([])
    args.ssl_algorithm = ssl_algorithm
    args.task = task
    for k, v in overrides.items():
        setattr(args, k.replace('-', '_'), v)
    if not args.models:
        defaults = _TASK_DEFAULTS[task]
        args.models = {'model': defaults['model']}
        args.optimizers = {'model': 'sgd'}
        args.lrers = {'model': 'polynomiallr'}
        args.criterions = {'model': defaults['criterion']}
    args.labeled_batch_size = args.batch_size - args.unlabeled_batch_size
    return args


def build_algorithm(args, mesh=None, iters_per_epoch=10):
    """Resolve component dicts and build the algorithm (mirrors
    proxy._build_ssl_algorithm, reference proxy.py:421-441)."""
    from . import ssl_algorithm as ssl_registry

    task = _task_module(getattr(args, 'task', 'sseg') or 'sseg')

    spatial = int(getattr(args, 'spatial_train', 0) or 0)
    if mesh is None:
        mesh = (parallel.make_mesh_2d(spatial) if spatial > 1
                else parallel.make_mesh())
    elif spatial > 1 and not parallel.is_spatial_mesh(mesh):
        mesh = parallel.make_mesh_2d(spatial,
                                     devices=mesh.devices.reshape(-1))
    n_dev = parallel.data_axis_size(mesh)

    model_dict, criterion_dict, optimizer_dict, lrer_dict = {}, {}, {}, {}
    for cname in args.models.keys():
        model_dict[cname] = getattr(task.model, args.models[cname])()(args)
        criterion_dict[cname] = getattr(task.criterion, args.criterions[cname])()(args)
        lrer_dict[cname] = getattr(nnlrer, args.lrers[cname])(args)
        optimizer_dict[cname] = getattr(nnoptimizer, args.optimizers[cname])(args)
    task_func = task.func.task_func()(args)

    if spatial > 1:
        # GSPMD mode: the step function sees the GLOBAL batch
        # (parallel/spatial.py), so its labeled/unlabeled split is global
        lbs_local = args.labeled_batch_size
        ubs_local = args.unlabeled_batch_size
        axis_name = None
    else:
        lbs_local = args.labeled_batch_size // n_dev
        ubs_local = args.unlabeled_batch_size // n_dev
        axis_name = parallel.DATA_AXIS
    local_b = lbs_local + ubs_local
    example_inp = (np.zeros((local_b, args.im_size, args.im_size, 3),
                            np.float32),)

    builder = ssl_registry.get_builder(args.ssl_algorithm)
    algo = builder(args, model_dict, optimizer_dict, lrer_dict,
                   criterion_dict, task_func,
                   mesh=mesh, axis_name=axis_name,
                   lbs_local=lbs_local, ubs_local=ubs_local,
                   iters_per_epoch=iters_per_epoch, example_inp=example_inp)
    algo.build()
    return algo


def synthetic_batch(args, mesh, seed=0):
    """One sharded synthetic two-stream train batch (labeled-first blocked
    per device, like the real input path)."""
    rng = np.random.default_rng(seed)
    n_dev = mesh.devices.size
    b = args.batch_size
    s = args.im_size
    img = rng.standard_normal((b, s, s, 3)).astype(np.float32)
    lbs, ubs = args.labeled_batch_size, args.unlabeled_batch_size
    if getattr(args, 'task', 'sseg') == 'sreg':
        gt = rng.uniform(0.0, 1.0, (b, s, s, 1)).astype(np.float32)
        if ubs > 0:
            gt[lbs:] = 0.0  # unlabeled placeholder (tasks/sreg/data.py)
    else:
        gt = rng.integers(0, args.num_classes, (b, s, s)).astype(np.int32)
        if ubs > 0:
            gt[lbs:] = -1  # fake label (reference data.py:104-105)
    if parallel.is_spatial_mesh(mesh):
        # GSPMD mode: global labeled-first order, no per-device re-blocking
        return parallel.shard_train_batch({'inp': (img,), 'gt': (gt,)}, mesh)
    if ubs > 0 and n_dev > 1:
        img = parallel.reorder_two_stream(img, lbs, ubs, n_dev)
        gt = parallel.reorder_two_stream(gt, lbs, ubs, n_dev)
    return parallel.shard_batch({'inp': (img,), 'gt': (gt,)}, mesh)
