"""Task proxy: experiment orchestration (reference:
pixelssl/task_template/proxy.py:18-457).

Pipeline preserved from the reference: argument validation → output dirs →
device scaling → dataset wiring (SplitUnlabeledWrapper / JointDatasetsWrapper
/ TwoStreamBatchSampler) → algorithm build → epoch loop with val/checkpoint
frequencies. TPU-first changes:

* ``gpus``/CUDA checks (proxy.py:252-261) become mesh facts: the config
  batch/lr/worker values are per-device and are scaled by the mesh size,
  exactly mirroring the reference's linear GPU scaling, but the scaled batch
  is materialized as ONE global array sharded over the mesh instead of a
  DataParallel scatter;
* the train loader re-blocks each two-stream batch so every device receives
  a local labeled-first sub-batch (parallel.reorder_two_stream) and ships it
  with a double-buffered device_put;
* validation batches are mesh-sized with ignore-padded tails instead of the
  reference's fixed batch_size=1 (proxy.py:402-403), keeping shapes static
  for XLA while scoring every sample exactly once.
"""

import copy
import functools
import os
import time

import jax
import numpy as np
import yaml

from .. import parallel
from ..nn import data as nndata
from ..nn import loader as nnloader
from ..nn import lrer as nnlrer
from ..nn import optimizer as nnoptimizer
from ..utils import cmd, logger


def add_parser_arguments(parser):
    """Core proxy flags — names match reference proxy.py:20-71."""
    # experimental arguments
    parser.add_argument('--exp-id', type=str, default='', metavar='', help='exp - unique id of experiment')
    parser.add_argument('--resume', type=str, default='', metavar='', help='exp - checkpoint to resume')
    parser.add_argument('--validation', type=cmd.str2bool, default=False, metavar='', help='exp - validation only')
    parser.add_argument('--out-path', type=str, default='', metavar='', help='exp - output root path')
    parser.add_argument('--visualize', type=cmd.str2bool, default=False, metavar='', help='exp - save visualization images')
    parser.add_argument('--debug', type=cmd.str2bool, default=False, metavar='', help='exp - debug mode')
    parser.add_argument('--val-freq', type=int, default=1, metavar='', help='exp - validation frequency [epoch]')
    parser.add_argument('--log-freq', type=int, default=100, metavar='', help='exp - logging frequency [iteration]')
    parser.add_argument('--visual-freq', type=int, default=100, metavar='', help='exp - visualization frequency [iteration]')
    parser.add_argument('--checkpoint-freq', type=int, default=1, metavar='', help='exp - checkpoint frequency [epoch]')
    parser.add_argument('--seed', type=int, default=0, metavar='', help='exp - global random seed (TPU build addition)')
    parser.add_argument('--steps-per-dispatch', type=int, default=1, metavar='',
                        help='exp - train steps fused per device dispatch via '
                             'lax.scan (TPU build addition; hides host latency)')
    parser.add_argument('--eager-ingest', type=cmd.str2bool, default=False, metavar='',
                        help='exp - materialize each train batch\'s '
                             'host->device transfer in the loader thread (a '
                             'tiny consuming reduction + block). On runtimes '
                             'with lazy device_put (the tunnel-attached dev '
                             'host, BASELINE.md ingest probes) this overlaps '
                             'ingest with the previous dispatch\'s compute '
                             '(TPU build addition)')
    parser.add_argument('--spatial-val', type=cmd.str2bool, default=False, metavar='',
                        help='exp - shard each validation image\'s height over '
                             'the mesh (GSPMD halo exchange; for images too '
                             'large for one chip — TPU build addition)')
    parser.add_argument('--spatial-train', type=int, default=0, metavar='',
                        help='exp - shard training activations\' height over '
                             'an N-way \'spatial\' mesh axis (GSPMD; data '
                             'parallelism uses the remaining devices/N). '
                             'Keeps the per-data-shard batch at the config '
                             'size while splitting each image\'s compute/'
                             'memory N ways — for resolutions whose '
                             'activations exceed one chip\'s HBM '
                             '(TPU build addition)')
    parser.add_argument('--profile-dir', type=str, default='', metavar='',
                        help='exp - dump a jax.profiler trace of training '
                             'steps [1, 1+profile-steps] of epoch 0 to this '
                             'directory (TPU build addition)')
    parser.add_argument('--profile-steps', type=int, default=10, metavar='',
                        help='exp - number of steps captured by --profile-dir')
    parser.add_argument('--exact-val', type=cmd.str2bool, default=False, metavar='',
                        help='exp - exact reference validation protocol: '
                             'batch 1, unpadded original image size '
                             '(reference proxy.py:402-403). Recompiles per '
                             'distinct shape — use for fidelity rescoring, '
                             'not in-training validation')
    parser.add_argument('--auto-resume', type=cmd.str2bool, default=False, metavar='',
                        help='exp - resume from the newest checkpoint in the '
                             'experiment ckpt dir if one exists (preemption '
                             'recovery — TPU build addition)')
    parser.add_argument('--distributed', type=cmd.str2bool, default=False, metavar='',
                        help='exp - multi-host (TPU pod) run: call '
                             'jax.distributed.initialize() and shard the '
                             'input pipeline per host '
                             '(parallel/multihost.py — TPU build addition; '
                             'the reference is single-process only)')

    # dataset / dataloader arguments
    parser.add_argument('--trainset', type=yaml.full_load, default={}, metavar='', help='data - {dataset_type: [paths]}')
    parser.add_argument('--valset', type=yaml.full_load, default={}, metavar='', help='data - {dataset_type: [paths]}')
    parser.add_argument('--num-workers', type=int, default=1, metavar='', help='data - loader workers per device')
    parser.add_argument('--im-size', type=int, default=None, metavar='', help='data - target input image size')
    parser.add_argument('--unlabeledset', type=yaml.full_load, default={}, metavar='', help='data - extra unlabeled sets')
    parser.add_argument('--sublabeled-path', type=str, default='', metavar='', help='data - labeled-subset prefix file')
    parser.add_argument('--ignore-unlabeled', type=cmd.str2bool, default=True, metavar='', help='data - skip unlabeled samples')

    # SSL algorithm arguments
    parser.add_argument('--ssl-algorithm', type=str, default='', metavar='', help='ssl - algorithm name')
    parser.add_argument('--models', type=yaml.full_load, default={}, metavar='', help='ssl - {component: task_model}')
    parser.add_argument('--optimizers', type=yaml.full_load, default={}, metavar='', help='ssl - {component: optimizer}')
    parser.add_argument('--lrers', type=yaml.full_load, default={}, metavar='', help='ssl - {component: lrer}')
    parser.add_argument('--criterions', type=yaml.full_load, default={}, metavar='', help='ssl - {component: criterion}')

    # training arguments (per-device, scaled by mesh size like the
    # reference's per-GPU scaling, proxy.py:252-261)
    parser.add_argument('--epochs', type=int, default=1, metavar='', help='train - total epochs')
    parser.add_argument('--batch-size', type=int, default=16, metavar='', help='train - batch size per device')
    parser.add_argument('--unlabeled-batch-size', type=int, default=0, metavar='', help='train - unlabeled samples per device batch')

    # autoset arguments
    parser.add_argument('--n-devices', type=int, default=0, metavar='', help='autoset - mesh size')
    parser.add_argument('--task', type=str, default='', metavar='', help='autoset - task name')
    parser.add_argument('--labeled-batch-size', type=int, default=None, metavar='', help='autoset - labeled samples per device batch')
    parser.add_argument('--checkpoint-path', type=str, default='', metavar='', help='autoset - checkpoint dir')
    parser.add_argument('--visual-debug-path', type=str, default='', metavar='', help='autoset')
    parser.add_argument('--visual-train-path', type=str, default='', metavar='', help='autoset')
    parser.add_argument('--visual-val-path', type=str, default='', metavar='', help='autoset')
    parser.add_argument('--is-epoch-lrer', type=cmd.str2bool, default=None, metavar='', help='autoset - epoch-wise lr stepping')
    parser.add_argument('--iters-per-epoch', type=int, default=None, metavar='', help='autoset')


def _latest_checkpoint(ckpt_dir):
    """Newest ``checkpoint_<epoch>`` directory under ``ckpt_dir``, by
    epoch number; None if the dir is absent/empty."""
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(ckpt_dir):
        if not name.startswith('checkpoint_'):
            continue
        try:
            epoch = int(name.split('_', 1)[1])
        except ValueError:
            continue
        if epoch > best_epoch:
            best, best_epoch = os.path.join(ckpt_dir, name), epoch
    return best


class TaskProxy(object):
    NAME = 'task'
    TASK_TYPE = None

    def __init__(self, args, func, data, model, criterion, mesh=None):
        self.args = args
        self.func = func
        self.data = data
        self.model = model
        self.criterion = criterion
        if mesh is None:
            # must run before the first jax op so the pod backend forms
            parallel.multihost.initialize(args)
            spatial_train = int(getattr(args, 'spatial_train', 0) or 0)
            if spatial_train > 1:
                if parallel.multihost.is_multihost():
                    logger.log_err('--spatial-train is not supported with '
                                   '--distributed multi-host runs yet')
                if getattr(args, 'spatial_val', False):
                    logger.log_err('--spatial-train and --spatial-val are '
                                   'mutually exclusive (use --exact-val or '
                                   'the bucketed default for validation)')
                mesh = parallel.make_mesh_2d(spatial_train)
            else:
                mesh = parallel.make_mesh()
        self.mesh = mesh

        self.train_loader = None
        self.val_loader = None
        self.model_dict = {}
        self.criterion_dict = {}
        self.optimizer_dict = {}
        self.lrer_dict = {}
        self.ssl_algorithm = None

        self._init()

    # ------------------------------------------------------------------

    def _init(self):
        self._preprocess_arguments()
        self._create_dataloader()
        self._build_ssl_algorithm()

    def run(self):
        args = self.args
        start_epoch = 0
        if getattr(args, 'auto_resume', False) and not args.resume:
            # preemption recovery: restart from the newest checkpoint in
            # this experiment's ckpt dir, or from scratch if none exists
            # (TPU build addition — preempted pod jobs relaunch with the
            # same command and pick up where they left off)
            latest = _latest_checkpoint(args.checkpoint_path)
            if latest is not None:
                logger.log_info('--auto-resume: found {0}'.format(latest))
                args.resume = latest
        if args.resume:
            if not os.path.exists(args.resume):
                logger.log_err(
                    'Cannot find checkpoint to resume: {0}\nThe benchmark '
                    'scripts default to rescoring a pretrained checkpoint '
                    '(reference script/*.py:24-25). Produce it with '
                    '`python scripts/rescore.py <script> --torch-ckpt '
                    '<reference .ckpt>`, or override '
                    "('validation', False), ('resume', '') to train from "
                    'scratch.'.format(args.resume))
            start_epoch = self.ssl_algorithm.load_checkpoint(args.resume)

        if args.validation:
            self.ssl_algorithm.validate(self.val_loader, start_epoch)
            return

        for epoch in range(start_epoch, args.epochs):
            t0 = time.time()
            self.ssl_algorithm.train(self.train_loader, epoch)
            self.ssl_algorithm.log_epoch_summary(
                epoch, time.time() - t0, len(self.train_loader))
            if self.val_loader is not None and (epoch + 1) % args.val_freq == 0:
                self.ssl_algorithm.validate(self.val_loader, epoch)
            if (epoch + 1) % args.checkpoint_freq == 0:
                self.ssl_algorithm.save_checkpoint(epoch + 1)

    # ------------------------------------------------------------------

    def _preprocess_arguments(self):
        args = self.args
        logger.log_mode(args.debug)
        args.task = self.NAME

        # component-dict validation (reference proxy.py:198-237)
        dicts = [args.models, args.optimizers, args.lrers, args.criterions]
        if len(set(len(d) for d in dicts)) != 1:
            logger.log_err('models/optimizers/lrers/criterions dicts must '
                           'have the same keys')
        for d in dicts[1:]:
            if set(d.keys()) != set(args.models.keys()):
                logger.log_err('models/optimizers/lrers/criterions dicts must '
                               'have the same keys')
        lrer_kinds = set()
        for cname, lname in args.lrers.items():
            lrer_kinds.add(lname in nnlrer.EPOCH_LRERS)
        if len(lrer_kinds) > 1:
            logger.log_err('All lrers must be of the same kind '
                           '(epoch-wise or iter-wise), reference proxy.py:218-237')
        if args.lrers:
            args.is_epoch_lrer = list(args.lrers.values())[0] in nnlrer.EPOCH_LRERS

        # device scaling — reference proxy.py:252-261 multiplied batch/lr/
        # workers by the CUDA device count; identical semantics on the mesh
        # under --spatial-train only the 'data' axis multiplies the batch;
        # spatial shards split each image's work, not the sample count
        n_dev = parallel.data_axis_size(self.mesh)
        args.n_devices = n_dev
        if n_dev > 1:
            if hasattr(args, 'lr') and args.lr not in (None, -1):
                args.lr = args.lr * n_dev
            args.num_workers = args.num_workers * n_dev
            args.batch_size = args.batch_size * n_dev
            args.unlabeled_batch_size = args.unlabeled_batch_size * n_dev
        args.labeled_batch_size = args.batch_size - args.unlabeled_batch_size
        if args.labeled_batch_size <= 0:
            logger.log_err('labeled_batch_size = batch_size - '
                           'unlabeled_batch_size must be > 0')

        # output directories (reference proxy.py:179-249)
        if args.out_path:
            exp_dir = os.path.join(args.out_path, args.exp_id or 'exp')
            args.checkpoint_path = os.path.join(exp_dir, 'ckpt')
            os.makedirs(args.checkpoint_path, exist_ok=True)
            if args.visualize:
                for sub in ('debug', 'train', 'val'):
                    p = os.path.join(exp_dir, 'visualization', sub)
                    os.makedirs(p, exist_ok=True)
                    setattr(args, 'visual_{0}_path'.format(sub), p)
            logger.log_file(os.path.join(
                exp_dir, 'val.log' if args.validation else 'train.log'))

    # ------------------------------------------------------------------

    def _load_dataset(self, dataset_name, dataset_dir, is_train=True):
        """Instantiate one dataset via the task data module's export function
        (reference proxy.py:443-457)."""
        if not hasattr(self.data, dataset_name):
            logger.log_err('Unknown dataset type: {0}'.format(dataset_name))
        dataset_args = copy.deepcopy(self.args)
        if is_train:
            dataset_args.trainset = {dataset_name: dataset_dir}
        else:
            dataset_args.valset = {dataset_name: dataset_dir}
        return getattr(self.data, dataset_name)()(dataset_args, is_train)

    def _create_dataloader(self):
        args = self.args
        n_dev = parallel.data_axis_size(self.mesh)
        with_unlabeled = (not args.ignore_unlabeled) and args.unlabeled_batch_size != 0
        without_unlabeled = args.ignore_unlabeled and args.unlabeled_batch_size == 0

        labeled_train_samples = unlabeled_train_samples = 0
        trainset = None
        if not args.validation:
            if args.ignore_unlabeled and args.unlabeled_batch_size != 0:
                logger.log_err('ignore_unlabeled == True requires unlabeled_batch_size == 0')
            if not args.ignore_unlabeled and args.unlabeled_batch_size == 0:
                logger.log_err('ignore_unlabeled == False requires unlabeled_batch_size != 0')

            trainset_num = sum(len(v) for v in args.trainset.values())
            unlabeledset_num = sum(len(v) for v in args.unlabeledset.values())

            if trainset_num == 1 and unlabeledset_num == 0:
                name = list(args.trainset.keys())[0]
                trainset = self._load_dataset(name, list(args.trainset.values())[0][0])
                labeled_train_samples = len(trainset.idxs)

                sublabeled_prefix = None
                if args.sublabeled_path:
                    if not os.path.exists(args.sublabeled_path):
                        logger.log_err('Cannot find labeled file: {0}'.format(args.sublabeled_path))
                    with open(args.sublabeled_path) as f:
                        sublabeled_prefix = [l.strip() for l in f.read().splitlines() if l.strip()]
                    sublabeled_prefix = sublabeled_prefix or None

                if sublabeled_prefix is not None:
                    trainset = nndata.SplitUnlabeledWrapper(
                        trainset, sublabeled_prefix,
                        ignore_unlabeled=args.ignore_unlabeled)
                    labeled_train_samples = len(trainset.labeled_idxs)
                    unlabeled_train_samples = len(trainset.unlabeled_idxs)
                elif with_unlabeled:
                    logger.log_err('Unlabeled samples requested without an SSL dataset wrapper')
            elif trainset_num > 1 or unlabeledset_num > 0:
                if args.sublabeled_path:
                    logger.log_err('Multiple training sets: sublabeled_path is not allowed')
                labeled_sets = [self._load_dataset(n, d)
                                for n, dirs in args.trainset.items() for d in dirs]
                unlabeled_sets = [self._load_dataset(n, d)
                                  for n, dirs in args.unlabeledset.items() for d in dirs]
                if not unlabeled_sets and with_unlabeled:
                    logger.log_err('Unlabeled samples requested but no unlabeledset given')
                trainset = nndata.JointDatasetsWrapper(
                    labeled_sets, unlabeled_sets,
                    ignore_unlabeled=args.ignore_unlabeled)
                labeled_train_samples = len(trainset.labeled_idxs)
                unlabeled_train_samples = len(trainset.unlabeled_idxs)

            if trainset is not None:
                if without_unlabeled:
                    idxs = (trainset.labeled_idxs
                            if getattr(trainset, 'labeled_idxs', None)
                            else list(range(len(trainset))))
                    sampler = nndata.OneStreamBatchSampler(
                        idxs, args.batch_size, seed=args.seed)
                    lbs, ubs = args.batch_size, 0
                else:
                    sampler = nndata.TwoStreamBatchSampler(
                        trainset.labeled_idxs, trainset.unlabeled_idxs,
                        args.labeled_batch_size, args.unlabeled_batch_size,
                        seed=args.seed)
                    lbs, ubs = args.labeled_batch_size, args.unlabeled_batch_size
                if parallel.multihost.is_multihost():
                    # every host walks the same seeded global index
                    # sequence and loads only its own devices' slice
                    # (parallel/multihost.py)
                    sampler = parallel.multihost.ProcessShardedSampler(
                        sampler, lbs, ubs,
                        parallel.multihost.local_device_positions(self.mesh),
                        n_dev)
                # chunked multi-step assembly: one preallocated
                # [n_steps, batch, ...] host array + ONE sharded
                # device_put per dispatch (vs per-step puts + an
                # on-device jnp.stack — each a tunnel/PCIe round-trip)
                n_steps = max(
                    1, getattr(args, 'steps_per_dispatch', 1) or 1)
                chunk_put = (self._make_train_chunk_put_fn(lbs, ubs, n_dev)
                             if n_steps > 1 else None)
                self.train_loader = nnloader.DataLoader(
                    trainset, sampler, num_workers=args.num_workers,
                    device_put_fn=self._eager_ingest(
                        self._make_train_put_fn(lbs, ubs, n_dev)),
                    chunk_steps=n_steps if chunk_put is not None else 1,
                    chunk_put_fn=self._eager_ingest(chunk_put))

        # validation loader: mesh-sized batches, ignore-padded tail
        valset_num = sum(len(v) for v in args.valset.values())
        valset = None
        if valset_num == 1:
            name = list(args.valset.keys())[0]
            valset = self._load_dataset(name, list(args.valset.values())[0][0],
                                        is_train=False)
        elif valset_num > 1:
            valsets = [self._load_dataset(n, d, is_train=False)
                       for n, dirs in args.valset.items() for d in dirs]
            valset = nndata.JointDatasetsWrapper(valsets, [], ignore_unlabeled=True)
        if valset is not None:
            spatial = bool(getattr(args, 'spatial_val', False))
            exact = bool(getattr(args, 'exact_val', False))
            self.val_loader = _ValLoader(
                valset, 1 if (spatial or exact) else max(1, n_dev), self.mesh,
                getattr(args, 'ignore_index', 255), spatial=spatial,
                exact=exact)

        if self.train_loader is None and not args.validation:
            logger.log_err('Train data loader is required unless validation mode')
        if self.val_loader is None and args.validation:
            logger.log_err('Validation data loader is required in validation mode')
        if self.val_loader is None:
            logger.log_warn('No validation loader — skipping validation during training')

        args.iters_per_epoch = len(self.train_loader) if self.train_loader is not None else -1

        logger.log_info('Dataset: train labeled={0} unlabeled={1} val={2}'.format(
            labeled_train_samples, unlabeled_train_samples,
            len(valset) if valset is not None else 0))

    def _eager_ingest(self, put):
        """--eager-ingest: force the transfer behind ``put`` to
        materialize in the calling (loader) thread — see
        parallel.touch_tree."""
        if put is None or not getattr(self.args, 'eager_ingest', False):
            return put

        def eager_put(np_batch):
            return parallel.touch_tree(put(np_batch))
        return eager_put

    def _make_train_put_fn(self, lbs, ubs, n_dev):
        mesh = self.mesh

        if parallel.multihost.is_multihost():
            # the ProcessShardedSampler already emitted per-device
            # labeled-first blocks for this host's devices — assemble the
            # global array from each host's local rows directly
            def put(np_batch):
                inp, gt = np_batch
                return parallel.multihost.put_local_batch(
                    {'inp': inp, 'gt': gt}, mesh)
            return put

        if parallel.is_spatial_mesh(mesh):
            # GSPMD mode: global labeled-first order as-is; batch on 'data',
            # image H on 'spatial' (parallel/spatial.py)
            def put(np_batch):
                inp, gt = np_batch
                return parallel.shard_train_batch({'inp': inp, 'gt': gt}, mesh)
            return put

        def put(np_batch):
            inp, gt = np_batch
            if ubs > 0 and n_dev > 1:
                inp = tuple(parallel.reorder_two_stream(a, lbs, ubs, n_dev) for a in inp)
                gt = tuple(parallel.reorder_two_stream(a, lbs, ubs, n_dev) for a in gt)
            batch = {'inp': inp, 'gt': gt}
            return parallel.shard_batch(batch, mesh)
        return put

    def _make_train_chunk_put_fn(self, lbs, ubs, n_dev):
        """device_put for a whole [n_steps, batch, ...] dispatch chunk
        (nn/loader.DataLoader chunk mode): the multi-step scan axis leads,
        so sharding specs gain a leading None; the two-stream reorder
        applies along axis 1. Returns None when chunked assembly is not
        supported (multi-host: each process only holds its local rows,
        parallel/multihost.put_local_batch) — the loader then falls back
        to per-step puts and the train loop stacks on device."""
        mesh = self.mesh

        if parallel.multihost.is_multihost():
            return None

        if parallel.is_spatial_mesh(mesh):
            def put(np_chunk):
                inp, gt = np_chunk
                return parallel.shard_train_chunk({'inp': inp, 'gt': gt},
                                                  mesh)
            return put

        def put(np_chunk):
            inp, gt = np_chunk
            if ubs > 0 and n_dev > 1:
                inp = tuple(parallel.reorder_two_stream_steps(a, lbs, ubs, n_dev)
                            for a in inp)
                gt = tuple(parallel.reorder_two_stream_steps(a, lbs, ubs, n_dev)
                           for a in gt)
            return parallel.shard_step_chunk({'inp': inp, 'gt': gt}, mesh)
        return put

    # ------------------------------------------------------------------

    def _build_ssl_algorithm(self):
        from .. import ssl_algorithm as ssl_registry
        args = self.args

        for cname in args.models.keys():
            for mod, registry, kind in ((self.model, args.models, 'model'),
                                        (self.criterion, args.criterions, 'criterion')):
                if not hasattr(mod, registry[cname]):
                    logger.log_err('Unknown task {0} `{1}` for component '
                                   '`{2}`'.format(kind, registry[cname], cname))
            self.model_dict[cname] = getattr(self.model, args.models[cname])()(args)
            self.criterion_dict[cname] = getattr(self.criterion, args.criterions[cname])()(args)
            self.lrer_dict[cname] = getattr(nnlrer, args.lrers[cname])(args)
            self.optimizer_dict[cname] = getattr(nnoptimizer, args.optimizers[cname])(args)

        task_func = self.func.task_func()(args)

        if parallel.is_spatial_mesh(self.mesh):
            # GSPMD mode: the step sees the GLOBAL batch (parallel/spatial.py)
            axis_name = None
            lbs_local = args.labeled_batch_size
            ubs_local = args.unlabeled_batch_size
        else:
            axis_name = parallel.DATA_AXIS
            n_dev = self.mesh.devices.size
            lbs_local = args.labeled_batch_size // n_dev
            ubs_local = args.unlabeled_batch_size // n_dev
        example_inp = self._example_inp(lbs_local + ubs_local)

        builder = ssl_registry.get_builder(args.ssl_algorithm)
        self.ssl_algorithm = builder(
            args, self.model_dict, self.optimizer_dict, self.lrer_dict,
            self.criterion_dict, task_func,
            mesh=self.mesh, axis_name=axis_name,
            lbs_local=lbs_local, ubs_local=ubs_local,
            iters_per_epoch=max(1, args.iters_per_epoch or 1),
            example_inp=example_inp)

        if self.TASK_TYPE not in self.ssl_algorithm.SUPPORTED_TASK_TYPES:
            logger.log_err('SSL algorithm {0} supports {1}, but task {2} is {3}'
                           .format(self.ssl_algorithm.NAME,
                                   self.ssl_algorithm.SUPPORTED_TASK_TYPES,
                                   args.task, self.TASK_TYPE))

        rng = jax.random.PRNGKey(args.seed)
        self.ssl_algorithm.build(rng)
        logger.log_info('SSL algorithm: {0}'.format(args.ssl_algorithm))

    def _example_inp(self, local_batch):
        """Zero arrays shaped like one local train batch, for model init."""
        dataset = (self.train_loader.dataset if self.train_loader is not None
                   else self.val_loader.dataset)
        inp, _ = dataset[0]
        return tuple(np.zeros((local_batch,) + np.asarray(a).shape,
                              dtype=np.asarray(a).dtype) for a in inp)


class _ValLoader(object):
    """Sequential validation loader: fixed mesh-sized batches; the tail is
    padded with copies whose GT is all-ignore so metrics count every sample
    exactly once while shapes stay static for XLA."""

    def __init__(self, dataset, batch_size, mesh, ignore_index=255,
                 spatial=False, exact=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.mesh = mesh
        self.ignore_index = ignore_index
        # spatial mode: shard each image's H axis over the mesh instead of
        # the batch axis (parallel/spatial.py) — batch_size is 1 and H is
        # padded to a mesh multiple
        self.spatial = spatial
        # exact mode: the reference validation protocol verbatim — batch 1,
        # no bucketing, no padding (reference proxy.py:402-403). Every
        # distinct image shape recompiles; batches are replicated over the
        # mesh (redundant compute, exact numbers).
        self.exact = exact

    def _put(self, batch):
        multihost = parallel.multihost.is_multihost()
        if self.exact:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            if multihost:
                # replicated: every host holds the identical full batch
                # (all hosts walk the same val sequence deterministically)
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        rep, np.ascontiguousarray(x)), batch)
            return jax.tree.map(lambda x: jax.device_put(np.asarray(x), rep),
                                batch)
        if not self.spatial:
            if multihost:
                # each host extracts its own devices' rows of the (identical)
                # global bucketed batch and contributes them as local shards
                positions = parallel.multihost.local_device_positions(self.mesh)
                local = jax.tree.map(
                    lambda x: np.ascontiguousarray(
                        np.asarray(x)[np.asarray(positions)]), batch)
                return parallel.multihost.put_local_batch(local, self.mesh)
            return parallel.shard_batch(batch, self.mesh)
        if multihost:
            logger.log_err('--spatial-val is not supported with --distributed '
                           'multi-host runs yet; use the bucketed or exact '
                           'validation modes')
        from jax.sharding import NamedSharding, PartitionSpec as P
        n = self.mesh.devices.size

        def put_leaf(x, fill):
            x = np.asarray(x)
            if x.ndim >= 3:  # [B, H, ...]: pad H to mesh multiple, shard H
                pad = (-x.shape[1]) % n
                if pad:
                    widths = [(0, 0)] * x.ndim
                    widths[1] = (0, pad)
                    x = np.pad(x, widths, constant_values=fill)
                spec = P(None, parallel.DATA_AXIS)
            else:
                spec = P()
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        # GT pads with ignore_index whatever its dtype (float-GT regression
        # tasks mask on the same sentinel, tasks/sreg/criterion.py); inputs
        # and masks pad with 0
        return {key: jax.tree.map(
                    functools.partial(
                        put_leaf,
                        fill=self.ignore_index if key == 'gt' else 0),
                    sub)
                for key, sub in batch.items()}

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    @staticmethod
    def _pad_arr(arr, target_shape, fill):
        arr = np.asarray(arr)
        pads = [(0, t - s) for s, t in zip(arr.shape, target_shape)]
        if not any(p[1] for p in pads):
            return arr
        return np.pad(arr, pads, mode='constant', constant_values=fill)

    def _pad_samples(self, samples):
        """Pad every sample to a common bucketed shape: inp arrays padded
        with 0, gt arrays with ignore_index (ignored by loss & metrics), so
        XLA sees few static shapes while every real pixel is scored."""
        n_inp = len(samples[0][0])
        n_gt = len(samples[0][1])
        bucket = 32

        def target(shapes):
            mx = np.max(np.asarray(shapes), axis=0)
            # bucket the spatial (leading two) dims only; channel-like
            # trailing dims stay exact
            out = []
            for i, d in enumerate(mx):
                if i < 2:
                    out.append(int(-(-int(d) // bucket) * bucket))
                else:
                    out.append(int(d))
            return tuple(out)

        inp_targets = [target([s[0][i].shape for s in samples]) for i in range(n_inp)]
        gt_targets = [target([s[1][i].shape for s in samples]) for i in range(n_gt)]
        out = []
        for inp, gt in samples:
            inp = tuple(self._pad_arr(a, inp_targets[i], 0.0)
                        for i, a in enumerate(inp))
            gt = tuple(self._pad_arr(a, gt_targets[i], self.ignore_index)
                       for i, a in enumerate(gt))
            out.append((inp, gt))
        return out

    def __iter__(self):
        n = len(self.dataset)
        if self.exact:
            for i in range(n):
                inp, gt = self.dataset[i]
                inp = tuple(np.asarray(a)[None] for a in inp)
                gt = tuple(np.asarray(g)[None] for g in gt)
                yield self._put({'inp': inp, 'gt': gt})
            return
        for start in range(0, n, self.batch_size):
            idxs = list(range(start, min(start + self.batch_size, n)))
            samples = [self.dataset[i] for i in idxs]
            n_pad = self.batch_size - len(samples)
            if n_pad:
                pad_inp, pad_gt = samples[-1]
                pad_gt = tuple(np.full_like(np.asarray(g), self.ignore_index)
                               for g in pad_gt)
                samples = samples + [(pad_inp, pad_gt)] * n_pad
            samples = self._pad_samples(samples)
            inp, gt = nnloader._stack_samples(samples)
            batch = {'inp': inp, 'gt': gt,
                     'valid': np.asarray([1.0] * len(idxs) + [0.0] * n_pad,
                                         np.float32)}
            yield self._put(batch)
