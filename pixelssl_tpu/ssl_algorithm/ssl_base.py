"""SSL algorithm base: pure-functional train/eval engines.

Re-design of the reference's ``_SSLBase`` (reference:
pixelssl/ssl_algorithm/ssl_base.py:19-91). The reference algorithm object
holds live torch models/optimizers and runs multi-launch train loops; here an
algorithm is a **state pytree + one fused jitted train step**:

* ``build(rng)`` initializes the state pytree (params, batch_stats, optimizer
  states, EMA copies, step counter, base RNG key) replicated over the mesh;
* ``_train_step(state, batch) -> (state, metrics)`` is traced ONCE and
  shard_map'd over the mesh data axis (parallel/mesh.py): all model
  forwards, losses, gradients, optimizer updates, EMA updates and BN-stat
  psums of one iteration fuse into a single XLA program — the reference's
  ≥2 (MT) to ≥7 (GCT) DataParallel scatter/gather rounds per iteration
  collapse into one device launch;
* per-step randomness derives from a base key folded with the step counter
  and the mesh axis index, so steps are reproducible and no RNG traffic
  crosses the host boundary;
* host-side ``train()``/``validate()`` only move batches and log meters,
  mirroring the reference loop structure (ssl_null.py:123-192).

Checkpointing is orbax-based with the reference's algorithm-name guard
(reference ssl_null.py:194-218).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logger, profiler
from ..utils.logger import AvgMeterSet
from ..task_template.func import METRIC_STR
from .. import parallel


def _tree_identity(tree):
    # jitted with replicated out_shardings by _gather_for_host; must be a
    # stable module-level function so jit's cache keys stay hittable
    return tree


class TaskContext(object):
    """Everything the proxy resolves for an algorithm build.

    Mirrors the reference export-function arguments
    (ssl_base.py:19-37: args, model_dict, optimizer_dict, lrer_dict,
    criterion_dict, task_func) plus the mesh/runtime facts the TPU build
    needs (per-device batch split, iters per epoch, example input).
    """

    def __init__(self, args, models, optimizers, lrers, criterions, task_func,
                 mesh=None, axis_name=parallel.DATA_AXIS,
                 lbs_local=None, ubs_local=None,
                 iters_per_epoch=None, example_inp=None, example_gt=None):
        self.args = args
        self.models = models            # dict name -> TaskModel
        self.optimizers = optimizers    # dict name -> OptimizerFactory
        self.lrers = lrers              # dict name -> LRSchedulerFactory
        self.criterions = criterions    # dict name -> TaskCriterion
        self.task_func = task_func
        self.mesh = mesh if mesh is not None else parallel.make_mesh()
        self.axis_name = axis_name
        # batch-scaling factor, NOT the raw device count: under a 2-D
        # --spatial-train mesh only the 'data' axis multiplies the global
        # batch (spatial shards split work), so the reference's
        # lr x gpu-count scalings (ssl_adv.py:72 discriminator_lr,
        # ssl_gct.py:107 fd_lr) must scale by the data axis alone
        self.n_dev = parallel.data_axis_size(self.mesh)
        self.lbs_local = lbs_local
        self.ubs_local = ubs_local
        self.iters_per_epoch = iters_per_epoch
        self.example_inp = example_inp  # tuple of LOCAL-shape arrays
        self.example_gt = example_gt

class SSLBase(object):
    NAME = 'ssl_base'
    SUPPORTED_TASK_TYPES = []

    def __init__(self, args, ctx):
        self.args = args
        self.ctx = ctx
        self.state = None
        self._train_step = None   # jitted shard_map'd step
        self._eval_step = None    # jitted eval fn
        self._debug_viz_fn = None  # lazily-jitted debug forward
        self._gather_fn = None     # lazily-jitted replicating identity
        self.meters = AvgMeterSet()

    # ------------------------------------------------------------------
    # build
    # ------------------------------------------------------------------

    def build(self, rng=None):
        """Initialize state and compile the fused steps."""
        if rng is None:
            rng = jax.random.PRNGKey(getattr(self.args, 'seed', 0) or 0)
        state = self._build_state(rng)
        state['step'] = jnp.zeros((), jnp.int32)
        state['rng'] = rng
        # parameter summary (reference create_model's model_str log,
        # nn/func.py:65-82)
        from ..nn.func import count_params
        for key, sub in state.items():
            if isinstance(sub, dict) and 'params' in sub:
                logger.log_info('Model `{0}`: {1:,} parameters'.format(
                    key, count_params(sub['params'])))
        self.state = parallel.replicate(state, self.ctx.mesh)
        self._steps_per_dispatch = max(
            1, getattr(self.args, 'steps_per_dispatch', 1) or 1)
        # task device_prep runs INSIDE every jitted step (wire-format
        # mapping, e.g. --u8-transfer normalize-on-device; identity by
        # default) — one wrapper here instead of one per algorithm
        step_fn = self._prepped_step_fn
        if self.ctx.axis_name is None and parallel.is_spatial_mesh(self.ctx.mesh):
            # --spatial-train: GSPMD auto-partitioning over the 2-D
            # ('data','spatial') mesh — the step sees the GLOBAL batch and
            # XLA derives the collectives (parallel/spatial.py)
            self._train_step = parallel.gspmd_train_step(
                step_fn, self.ctx.mesh)
            if self._steps_per_dispatch > 1:
                self._multi_step = parallel.gspmd_multi_step(
                    step_fn, self.ctx.mesh, self._steps_per_dispatch)
        else:
            self._train_step = parallel.parallel_step(
                step_fn, self.ctx.mesh, self.ctx.axis_name)
            if self._steps_per_dispatch > 1:
                self._multi_step = parallel.parallel_multi_step(
                    step_fn, self.ctx.mesh, self._steps_per_dispatch,
                    self.ctx.axis_name)
        self._eval_step = self._make_eval_step()
        return self.state

    def _prepped_step_fn(self, state, batch):
        return self._step_fn(state, self.ctx.task_func.device_prep(batch))

    def _build_state(self, rng):
        raise NotImplementedError

    def _step_fn(self, state, batch):
        """Pure train step, written against ctx.axis_name."""
        raise NotImplementedError

    def _eval_fn(self, state, batch):
        """Pure eval step: returns {model_id: (activated_pred_tuple,
        loss_vec)} — one entry per model to score (e.g. MT scores both the
        student and the EMA teacher, reference ssl_mt.py:226-290)."""
        raise NotImplementedError

    def _debug_visualize(self, batch, out_path):
        """Algorithm-specific train-time debug dumps next to the standard
        inp/pred/gt PNGs (reference: D confidence maps ssl_adv.py:393-408,
        GCT flawmaps/pseudo-GT ssl_gct.py:486-499). Base: nothing."""

    def _make_eval_step(self):
        # eval uses running BN stats → no named collectives; plain jit.
        # Inputs arrive explicitly placed (batch-sharded by the loader, or
        # H-axis sharded under --spatial-val) and state is replicated, so
        # jit honors the committed shardings and GSPMD partitions the rest
        # (incl. conv halo exchanges in spatial mode). device_prep runs
        # first so train-batch visualization under --u8-transfer sees
        # normalized floats like the val path.
        def eval_fn(state, batch):
            return self._eval_fn(state, self.ctx.task_func.device_prep(batch))
        return jax.jit(eval_fn)

    # ------------------------------------------------------------------
    # helpers shared by all algorithm step functions
    # ------------------------------------------------------------------

    def _step_rng(self, state, salt=0):
        rng = jax.random.fold_in(state['rng'], state['step'] * 131 + salt)
        return parallel.fold_rng(rng, self.ctx.axis_name)

    def _pmean(self, tree):
        return parallel.pmean_if_parallel(tree, self.ctx.axis_name)

    def _global_mean(self, vec):
        """Mean of a per-sample vector across ALL devices' samples."""
        s = jnp.sum(vec)
        n = jnp.asarray(vec.shape[0], jnp.float32)
        s, n = parallel.psum_if_parallel((s, n), self.ctx.axis_name)
        return s / n

    def _apply_updates(self, tx, params, grads, opt_state):
        import optax
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    # ------------------------------------------------------------------
    # structured metrics log (TPU build addition: the reference only wrote
    # formatted text logs; a metrics.jsonl stream makes runs machine-
    # comparable)
    # ------------------------------------------------------------------

    def _log_jsonl(self, record):
        path = getattr(self.args, 'checkpoint_path', '')
        if not path or jax.process_index() != 0:
            return
        import json
        out = os.path.join(os.path.dirname(path.rstrip('/')), 'metrics.jsonl')
        with open(out, 'a') as f:
            f.write(json.dumps(record) + '\n')

    def log_epoch_summary(self, epoch, wall_s, n_iters):
        """Per-epoch throughput summary: achieved samples/s through the
        WHOLE loop (host loader -> device_put -> fused steps), the number
        capacity planning needs next to bench.py's device-only ceiling.
        The reference never reports throughput (its logs are per-iter
        losses only, e.g. ssl_null.py:160-190); tools/e2e_tpu_bench.py
        parses the jsonl record this emits."""
        n_chips = max(1, int(self.ctx.mesh.devices.size))
        total_bs = int(self.args.batch_size)  # labeled+unlabeled, global
        sps = n_iters * total_bs / max(wall_s, 1e-9)
        logger.log_info(
            'epoch {0:>3} done: {1} iters in {2:.1f}s — {3:.1f} samples/s '
            '({4:.1f}/chip x {5} chips), avg step {6:.3f}s'.format(
                epoch, n_iters, wall_s, sps, sps / n_chips, n_chips,
                wall_s / max(1, n_iters)))
        self._log_jsonl(dict(
            phase='epoch_summary', epoch=epoch, algorithm=self.NAME,
            wall_s=round(wall_s, 3), iters=n_iters,
            samples_per_sec=round(sps, 2),
            samples_per_sec_per_chip=round(sps / n_chips, 2),
            n_chips=n_chips))

    # ------------------------------------------------------------------
    # host loops (structure mirrors reference ssl_null.py:123-192)
    # ------------------------------------------------------------------

    def train(self, data_loader, epoch):
        if self._steps_per_dispatch > 1:
            return self._train_multi(data_loader, epoch)
        self.meters.reset()
        args = self.args
        n_batches = len(data_loader)
        prof = profiler.ProfileWindow(args, epoch)
        t0 = time.time()
        last_logged = 0
        for idx, batch in enumerate(data_loader):
            data_time = time.time() - t0
            prof.tick(idx, self.state)
            self.state, metrics = self._train_step(self.state, batch)
            if (getattr(args, 'visualize', False) and
                    getattr(args, 'visual_train_path', '') and
                    idx % max(1, args.visual_freq) == 0):
                # extra eval forward only at visual_freq cadence
                # (reference visualizes from the train forward itself,
                # e.g. ssl_null.py:224-229); device_prep maps wire-format
                # batches (u8 mode) for the debug forwards — idempotent
                # for the normal float path
                vis_batch = self.ctx.task_func.device_prep(batch)
                outputs = self._eval_step(self.state, vis_batch)
                out = os.path.join(args.visual_train_path,
                                   '{0}_{1}'.format(epoch, idx))
                for model_id, (activated_pred, _) in outputs.items():
                    self.ctx.task_func.visualize(
                        out, id_str=model_id,
                        inp=tuple(a[:1] for a in vis_batch['inp']),
                        pred=tuple(a[:1] for a in activated_pred),
                        gt=tuple(a[:1] for a in vis_batch['gt']))
                self._debug_visualize(vis_batch, out)
            if (idx + 1) % args.log_freq == 0 or idx == n_batches - 1:
                # device sync only at log boundaries — keeps the step
                # pipeline free of per-iteration host round-trips
                metrics = jax.device_get(metrics)
                self.meters.update_dict(
                    {k: float(np.asarray(v)) for k, v in metrics.items()})
                self.meters.update('batch_time',
                                   (time.time() - t0) / max(1, idx + 1 - last_logged))
                last_logged = idx + 1
                logger.log_info(
                    'epoch {0:>3} iter {1:>5}/{2:<5} {3}'.format(
                        epoch, idx + 1, n_batches,
                        '  '.join('{0}: {1:.5f}'.format(k, float(np.asarray(v)))
                                  for k, v in sorted(metrics.items()))))
                self._log_jsonl(dict(
                    {k: float(np.asarray(v)) for k, v in metrics.items()},
                    phase='train', epoch=epoch, iter=idx + 1,
                    algorithm=self.NAME))
                t0 = time.time()
        prof.close(self.state)
        return self.meters

    def _log_train_metrics(self, epoch, done, n_batches, metrics):
        """Sync one step's metrics to host, feed the meters, and emit the
        iter log line + jsonl record (shared by the dispatch and tail
        paths of _train_multi)."""
        metrics = jax.device_get(metrics)
        vals = {k: float(np.asarray(v)) for k, v in metrics.items()}
        self.meters.update_dict(vals)
        logger.log_info(
            'epoch {0:>3} iter {1:>5}/{2:<5} {3}'.format(
                epoch, done, n_batches,
                '  '.join('{0}: {1:.5f}'.format(k, v)
                          for k, v in sorted(vals.items()))))
        self._log_jsonl(dict(vals, phase='train', epoch=epoch, iter=done,
                             algorithm=self.NAME))

    def _train_multi(self, data_loader, epoch):
        """Multi-step dispatch path: lax.scan over --steps-per-dispatch
        batches per device round-trip. When the loader runs in chunk mode
        (nn/loader.DataLoader chunk_steps > 1) the whole [n, batch, ...]
        dispatch chunk arrives pre-assembled and already sharded — one
        host→device transfer per dispatch; otherwise (multi-host) per-step
        batches are accumulated and stacked on device as before."""
        self.meters.reset()
        args = self.args
        n = self._steps_per_dispatch
        n_batches = len(data_loader)
        prof = profiler.ProfileWindow(args, epoch)
        chunked_loader = getattr(data_loader, 'chunk_steps', 1) > 1
        visualizing = (getattr(args, 'visualize', False) and
                       getattr(args, 'visual_train_path', ''))
        chunk = []
        done = 0
        dispatch_idx = 0
        t0 = time.time()
        for item in data_loader:
            if chunked_loader:
                tag, payload = item
                if tag == 'single':  # leftover tail: single-step path
                    self.state, metrics = self._train_step(
                        self.state, payload)
                    done += 1
                    # tail steps must still reach the meters / iter log
                    # (otherwise the epoch's last iterations are invisible)
                    if done % max(args.log_freq, 1) == 0 or done >= n_batches:
                        self._log_train_metrics(epoch, done, n_batches,
                                                metrics)
                    continue
                stacked = payload
                n_in_chunk = n
                # last step's batch is sliced lazily inside the visual
                # branch below — an eager device slice per chunk would
                # dispatch work even when visual_freq never fires
                last_batch = None
            else:
                chunk.append(item)
                if len(chunk) < n:
                    continue
                last_batch = chunk[-1]
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *chunk)
                n_in_chunk = len(chunk)
                chunk = []
            prof.tick(dispatch_idx, self.state)
            dispatch_idx += 1
            self.state, metrics = self._multi_step(self.state, stacked)
            done += n_in_chunk
            if (visualizing and
                    done % max(1, args.visual_freq) < n_in_chunk):
                if last_batch is None:
                    # sliced on device (keeps shardings); `stacked` is
                    # still alive here
                    last_batch = jax.tree.map(lambda x: x[-1], stacked)
                vis_batch = self.ctx.task_func.device_prep(last_batch)
                outputs = self._eval_step(self.state, vis_batch)
                out = os.path.join(args.visual_train_path,
                                   '{0}_{1}'.format(epoch, done))
                for model_id, (activated_pred, _) in outputs.items():
                    self.ctx.task_func.visualize(
                        out, id_str=model_id,
                        inp=tuple(a[:1] for a in vis_batch['inp']),
                        pred=tuple(a[:1] for a in activated_pred),
                        gt=tuple(a[:1] for a in vis_batch['gt']))
                self._debug_visualize(vis_batch, out)
            if done % max(args.log_freq, n) < n or done >= n_batches:
                self._log_train_metrics(epoch, done, n_batches, metrics)
        prof.close(self.state)
        # leftover batches (< n): single-step path; log the final one so
        # the epoch tail shows up in the meters / iter log
        for batch in chunk:
            self.state, metrics = self._train_step(self.state, batch)
            done += 1
        if chunk:
            self._log_train_metrics(epoch, done, n_batches, metrics)
        self.meters.update('batch_time', (time.time() - t0) / max(1, done))
        return self.meters

    def _gather_for_host(self, tree):
        """All-gather batch-sharded device values into fully-replicated
        arrays so every host can read them with numpy (multi-host runs:
        a P('data')-sharded global array is not addressable from one
        process; a jitted identity with replicated out_shardings is the
        collective gather). The jitted fn is cached on self — a fresh
        lambda per call would defeat jit's cache and retrace/lower on
        every validation batch."""
        fn = getattr(self, '_gather_fn', None)
        if fn is None:
            rep = parallel.replicate_sharding(self.ctx.mesh)  # prefix: all
            fn = self._gather_fn = jax.jit(_tree_identity, out_shardings=rep)
        return fn(tree)

    def validate(self, data_loader, epoch):
        # fresh meter set — reset() keeps stale training keys alive, which
        # would leak zero-valued training meters into the val report
        self.meters = AvgMeterSet()
        task_func = self.ctx.task_func
        multihost = parallel.multihost.is_multihost()
        for idx, batch in enumerate(data_loader):
            outputs = self._eval_step(self.state, batch)
            if multihost:
                outputs, batch = self._gather_for_host((outputs, batch))
            valid = batch.get('valid')
            for model_id, (activated_pred, loss_vec) in outputs.items():
                if valid is not None:
                    lv = np.asarray(loss_vec)
                    v = np.asarray(valid)
                    loss = float((lv * v).sum() / max(v.sum(), 1.0))
                else:
                    loss = float(np.asarray(jnp.mean(loss_vec)))
                self.meters.update('{0}_loss'.format(model_id), loss)
                task_func.metrics(activated_pred, batch['gt'], batch['inp'],
                                  self.meters, id_str=model_id)
                if (getattr(self.args, 'visualize', False) and
                        getattr(self.args, 'visual_val_path', '') and
                        idx % max(1, self.args.visual_freq) == 0):
                    import os
                    out = os.path.join(self.args.visual_val_path,
                                       '{0}_{1}'.format(epoch, idx))
                    task_func.visualize(out, id_str=model_id,
                                        inp=tuple(a[:1] for a in batch['inp']),
                                        pred=tuple(a[:1] for a in activated_pred),
                                        gt=tuple(a[:1] for a in batch['gt']))
        results = {}
        for key, meter in self.meters.items():
            if METRIC_STR in key:
                results[key] = meter.avg
                logger.log_info('val epoch {0}: {1} = {2:.5f}'.format(
                    epoch, key, float(meter.avg)))
        for key, meter in self.meters.items():
            if key.endswith('_loss'):
                logger.log_info('val epoch {0}: {1} = {2:.5f}'.format(
                    epoch, key, float(meter.avg)))
        record = {k: float(v) for k, v in results.items()}
        record.update({k: float(m.avg) for k, m in self.meters.items()
                       if k.endswith('_loss')})
        self._log_jsonl(dict(record, phase='val', epoch=epoch,
                             algorithm=self.NAME))
        return results

    # ------------------------------------------------------------------
    # checkpointing (orbax pytree + algorithm-name guard)
    # ------------------------------------------------------------------

    def save_checkpoint(self, epoch, path=None):
        import orbax.checkpoint as ocp
        if path is None:
            path = os.path.join(self.args.checkpoint_path,
                                'checkpoint_{0}'.format(epoch))
        path = os.path.abspath(path)
        # overwrite semantics like the reference's torch.save (its
        # ssl_null.py:194-204 re-saves checkpoint_N on a re-run): orbax
        # refuses to write into an existing directory, so clear a stale
        # one first (primary host only; orbax barriers before writing)
        if jax.process_index() == 0 and os.path.isdir(path):
            import shutil
            shutil.rmtree(path)
        # multi-host: EVERY process must call save — orbax synchronizes
        # processes internally (barriers) and only the primary host writes
        # the replicated host-numpy data; gating non-zero processes out
        # deadlocks process 0 inside orbax's barrier
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, {'state': jax.device_get(self.state),
                              'epoch': np.asarray(epoch),
                              'algorithm_name': _encode_name(self.NAME)})
        if jax.process_index() == 0:
            logger.log_info('Saved checkpoint: {0}'.format(path))
        return path

    def load_checkpoint(self, path=None):
        import orbax.checkpoint as ocp
        path = os.path.abspath(path or self.args.resume)
        template = {'state': jax.device_get(self.state),
                    'epoch': np.asarray(0),
                    'algorithm_name': _encode_name('')}
        with ocp.StandardCheckpointer() as ckptr:
            try:
                restored = ckptr.restore(path, template)
            except Exception as exc:
                # surface orbax restore errors as a framework-level
                # message (keeping the original traceback in the log for
                # I/O-type failures): a tree-structure mismatch usually
                # means the checkpoint was written by an incompatible
                # build or a different model/algorithm configuration
                import traceback
                logger.log_err(
                    'Failed to restore checkpoint at {0}:\n{1}\n  '
                    'A tree-structure mismatch usually means the '
                    'checkpoint was written by an older/incompatible '
                    'build or a different model/algorithm configuration '
                    'than this run.'.format(
                        path, traceback.format_exc().rstrip()))
        saved_name = _decode_name(restored['algorithm_name'])
        if saved_name != self.NAME:
            logger.log_err('Checkpoint at {0} was saved by SSL algorithm '
                           '`{1}`, expected `{2}` '
                           '(reference guard: ssl_null.py:206-218)'
                           .format(path, saved_name, self.NAME))
        self.state = parallel.replicate(restored['state'], self.ctx.mesh)
        logger.log_info('Loaded checkpoint: {0} (epoch {1})'.format(
            path, int(restored['epoch'])))
        return int(restored['epoch'])


def aux_compute_dtype(args):
    """Conv compute dtype for algorithm-owned auxiliary modules
    (discriminator, flaw detector, aux decoders, rotation head), matching
    the task models' --bf16 convention (tasks/sseg/model.py:_model_dtype).
    Params stay fp32; every aux module casts its outputs to fp32 before
    losses/resizes, so only the MXU compute precision changes."""
    return jnp.bfloat16 if getattr(args, 'bf16', True) else jnp.float32


def ema_update(t_params, s_params, decay):
    """EMA teacher update in fp32 math regardless of storage dtype; the
    result is rounded back to the teacher's storage dtype (bf16 under
    --bf16-ema, halving EMA HBM traffic; fp32 default for exact parity).
    bf16 storage drops per-step deltas below the stored value's half-ULP
    (~2^-9 relative), stalling the teacher near convergence — see
    docs/performance.md before enabling it for accuracy runs."""
    return jax.tree.map(
        lambda t, s: (decay * t.astype(jnp.float32) +
                      (1.0 - decay) * s.astype(jnp.float32)).astype(t.dtype),
        t_params, s_params)


def maybe_bf16(tree, enabled):
    """Cast float32 leaves to bf16 when enabled (teacher EMA storage)."""
    if not enabled:
        return tree
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x, tree)


def save_gray_map(arr, path):
    """Save a [1,H,W,1]/[H,W]-like 0-1 map as an L-mode PNG (the format the
    reference uses for D confidence maps / flawmaps, ssl_adv.py:402-408)."""
    from PIL import Image
    a = np.asarray(jax.device_get(arr)).astype(np.float32)
    while a.ndim > 2:
        a = a[0] if a.shape[0] == 1 else a[..., 0]
    Image.fromarray((np.clip(a, 0.0, 1.0) * 255).astype('uint8'),
                    mode='L').save(path)


_NAME_BYTES = 64


def _encode_name(name):
    """Algorithm name as a fixed-width uint8 array so the string itself
    rides inside the orbax pytree (checkpoint guard, reference
    ssl_null.py:206-218 compares names by equality)."""
    raw = name.encode('utf-8')[:_NAME_BYTES]
    return np.frombuffer(raw.ljust(_NAME_BYTES, b'\0'), np.uint8).copy()


def _decode_name(arr):
    return bytes(np.asarray(arr, np.uint8).tobytes()).rstrip(b'\0').decode(
        'utf-8', 'replace')
