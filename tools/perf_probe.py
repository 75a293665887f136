"""Parameterized TPU throughput probe: one algorithm config, K scanned
steps per dispatch, prints steps/s/chip + samples/s/chip as one JSON line.

Usage::

    python tools/perf_probe.py --algo ssl_mt --backbone resnet101 \
        --im-size 321 --batch 4 --unlabeled 2 [--model pspnet] \
        [--remat 1] [--scan 32] [--extra '{"ema_decay": 0.99}']

The measurement pattern matches bench.py: steps run inside one lax.scan
dispatch so the number reflects device throughput, not tunnel RPC latency
(CLAUDE.md: per-dispatch RPC is 70-130 ms on this host).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))


ALGO_DEFAULTS = {
    'ssl_null': dict(ignore_unlabeled=True),
    'ssl_mt': dict(cons_scale=1.0, cons_rampup_epochs=3, ema_decay=0.99),
    'ssl_adv': dict(adv_for_labeled=True, labeled_adv_scale=0.01,
                    unlabeled_adv_scale=0.001),
    'ssl_s4l': dict(rotated_sup_scale=0.1, rotation_scale=0.1),
    'ssl_cutmix': dict(cons_scale=1.0, cons_rampup_epochs=3,
                       cons_threshold=0.9, ema_decay=0.99),
    'ssl_gct': dict(ssl_mode='gct', fc_ssl_scale=1.0, dc_ssl_scale=1.0,
                    dc_threshold=0.6, dc_rampup_epochs=3, mu=0.5, nu=1,
                    fd_lr=0.0001, fd_scale=10.0),
    # the round-1 benchmark decoder mix: 2 VAT + 2 dropout + 2 context +
    # 2 feature-noise + 1 feature-drop = 9 aux decoders (BASELINE.md)
    'ssl_cct': dict(cons_scale=1.0, cons_rampup_epochs=3, ad_lr_scale=10.0,
                    vat_dec_num=2, drop_dec_num=2, context_dec_num=2,
                    fn_dec_num=2, fd_dec_num=1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--algo', default='ssl_mt')
    ap.add_argument('--model', default='deeplabv2',
                    choices=['deeplabv2', 'pspnet'])
    ap.add_argument('--backbone', default='resnet101')
    ap.add_argument('--im-size', type=int, default=321)
    ap.add_argument('--batch', type=int, default=4, help='per-chip total')
    ap.add_argument('--unlabeled', type=int, default=2, help='per-chip')
    ap.add_argument('--num-classes', type=int, default=21)
    ap.add_argument('--scan', type=int, default=32)
    ap.add_argument('--remat', type=int, default=0)
    ap.add_argument('--calls', type=int, default=2)
    ap.add_argument('--extra', type=json.loads, default={})
    ap.add_argument('--trace-dir', default='',
                    help='capture a jax.profiler trace of one timed dispatch')
    opts = ap.parse_args()

    import jax
    from pixelssl_tpu.utils import env as _env
    _env.enable_compile_cache(os.path.join(_env.repo_root(), '.jax_cache'))
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from pixelssl_tpu import harness, parallel

    mesh = parallel.make_mesh()
    n_dev = mesh.devices.size

    cfg = dict(backbone=opts.backbone, im_size=opts.im_size,
               num_classes=opts.num_classes,
               batch_size=opts.batch * n_dev,
               unlabeled_batch_size=opts.unlabeled * n_dev,
               ignore_unlabeled=(opts.algo == 'ssl_null'),
               lr=0.00025, momentum=0.9, weight_decay=0.0005, epochs=20,
               remat=bool(opts.remat))
    if opts.model != 'deeplabv2':
        # full component dicts, as harness.default_args only fills the
        # task defaults when `models` is unset
        cfg.update(models={'model': opts.model},
                   optimizers={'model': 'sgd'},
                   lrers={'model': 'polynomiallr'},
                   criterions={'model': 'sseg_criterion'})
    cfg.update(ALGO_DEFAULTS[opts.algo])
    cfg.update(opts.extra)
    args = harness.default_args(opts.algo, **cfg)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=100)
    batch = harness.synthetic_batch(args, mesh)

    def multi_step(state, batch):
        def body(s, _):
            s2, _m = algo._step_fn(s, batch)
            return s2, None
        state, _ = jax.lax.scan(body, state, None, length=opts.scan)
        return algo._step_fn(state, batch)

    stepper = jax.jit(shard_map(
        multi_step, mesh=mesh,
        in_specs=(P(), P(parallel.DATA_AXIS)),
        out_specs=(P(), P()), check_vma=False))

    t_c0 = time.perf_counter()
    state, metrics = stepper(algo.state, batch)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t_c0
    assert int(np.asarray(state['step'])) == opts.scan + 1
    loss_key = next(k for k in metrics if 'loss' in k)
    assert np.isfinite(float(np.asarray(metrics[loss_key])))

    if opts.trace_dir:
        jax.profiler.start_trace(opts.trace_dir)
    t0 = time.perf_counter()
    for _ in range(opts.calls):
        state, metrics = stepper(state, batch)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    if opts.trace_dir:
        jax.profiler.stop_trace()

    total_steps = opts.calls * (opts.scan + 1)
    sps = total_steps / dt / n_dev
    print(json.dumps({
        'algo': opts.algo, 'model': opts.model, 'backbone': opts.backbone,
        'im_size': opts.im_size,
        'batch_per_chip': opts.batch, 'unlabeled_per_chip': opts.unlabeled,
        'remat': bool(opts.remat), 'extra': opts.extra,
        'steps_per_sec_per_chip': round(sps, 3),
        'samples_per_sec_per_chip': round(sps * opts.batch, 1),
        'compile_plus_first_dispatch_s': round(compile_s, 1),
    }))


if __name__ == '__main__':
    main()
