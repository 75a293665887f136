"""TPU inference/serving throughput bench: eval forward images/s/chip.

The training-side numbers (bench.py, tools/perf_probe.py) measure the
fused SSL train step; this measures the deployment path — the same
``activated_pred`` eval forward that tools/export_serving.py ships as a
StableHLO artifact — at a fixed batch/size, bf16 conv compute.

Usage::

    python tools/infer_bench.py --model deeplabv2 --backbone resnet101 \
        --im-size 321 --batch 8 [--scan 32] [--trace-dir DIR]

Measurement pattern matches bench.py: K forwards run inside ONE lax.scan
dispatch so the number reflects device throughput, not tunnel RPC latency
(CLAUDE.md: per-dispatch RPC is 70-130 ms on this host). A tiny
output→input feedback term makes each scan iteration data-dependent on
the previous one, so XLA cannot hoist the loop-invariant forward out of
the while loop and "measure" a single forward.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='deeplabv2',
                    choices=['deeplabv2', 'pspnet'])
    ap.add_argument('--backbone', default='resnet101')
    ap.add_argument('--im-size', type=int, default=321)
    ap.add_argument('--batch', type=int, default=8, help='per-chip')
    ap.add_argument('--num-classes', type=int, default=21)
    ap.add_argument('--scan', type=int, default=32)
    ap.add_argument('--calls', type=int, default=2)
    ap.add_argument('--bf16', type=int, default=1)
    ap.add_argument('--extra', type=json.loads, default={},
                    help='extra default_args overrides, e.g. '
                         '\'{"output_stride": 8}\'')
    ap.add_argument('--trace-dir', default='',
                    help='capture a jax.profiler trace of one timed dispatch')
    opts = ap.parse_args()

    import jax
    from pixelssl_tpu.utils import env as _env
    _env.enable_compile_cache(os.path.join(_env.repo_root(), '.jax_cache'))
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pixelssl_tpu import harness, parallel

    mesh = parallel.make_mesh()
    n_dev = mesh.devices.size

    cfg = dict(
        backbone=opts.backbone, im_size=opts.im_size,
        num_classes=opts.num_classes, batch_size=opts.batch * n_dev,
        unlabeled_batch_size=0, ignore_unlabeled=True,
        lr=0.01, momentum=0.9, epochs=1, bf16=bool(opts.bf16),
        models={'model': opts.model}, optimizers={'model': 'sgd'},
        lrers={'model': 'polynomiallr'},
        criterions={'model': 'sseg_criterion'})
    cfg.update(opts.extra)
    args = harness.default_args('ssl_null', **cfg)
    algo = harness.build_algorithm(args, mesh=mesh)
    model = algo.model
    variables = {'params': algo.state['model']['params'],
                 'batch_stats': algo.state['model']['batch_stats']}

    def forward(x):
        resulter, _ = model.apply(variables, (x,), train=False)
        return resulter['activated_pred'][0]

    def multi_infer(x):
        def body(carry, _):
            y = forward(carry)
            # data-dependent feedback (≈0 numerically) so XLA cannot hoist
            # the forward out of the scan loop
            carry = carry + 1e-12 * jnp.mean(y).astype(carry.dtype)
            return carry, jnp.mean(y)
        _, ys = jax.lax.scan(body, x, None, length=opts.scan)
        return ys

    runner = jax.jit(shard_map(
        multi_infer, mesh=mesh,
        in_specs=P(parallel.DATA_AXIS), out_specs=P(), check_vma=False))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (opts.batch * n_dev, opts.im_size, opts.im_size, 3)), jnp.float32)

    t_c0 = time.perf_counter()
    ys = runner(x)
    jax.block_until_ready(ys)
    compile_s = time.perf_counter() - t_c0
    assert np.all(np.isfinite(np.asarray(ys)))

    if opts.trace_dir:
        jax.profiler.start_trace(opts.trace_dir)
    t0 = time.perf_counter()
    for _ in range(opts.calls):
        ys = runner(x)
    jax.block_until_ready(ys)
    dt = time.perf_counter() - t0
    if opts.trace_dir:
        jax.profiler.stop_trace()

    total = opts.calls * opts.scan * opts.batch * n_dev
    ips = total / dt / n_dev
    print(json.dumps({
        'model': opts.model, 'backbone': opts.backbone,
        'im_size': opts.im_size, 'batch_per_chip': opts.batch,
        'output_stride': getattr(args, 'output_stride', None),
        'bf16': bool(opts.bf16),
        'images_per_sec_per_chip': round(ips, 1),
        'latency_ms_per_batch': round(1000.0 * opts.batch / ips, 2),
        'compile_plus_first_dispatch_s': round(compile_s, 1),
    }))


if __name__ == '__main__':
    main()
