"""Benchmark: SSL train steps/sec/chip on the flagship config.

Config mirrors the reference's headline DeepLab-v2 benchmark
(task/sseg/script/deeplabv2_pascalvoc_1-8_sslmt.py: ResNet-101, im 321,
batch 4/device with 2 unlabeled, Mean Teacher) — the canonical SSL step
(double forward + EMA).

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
``vs_baseline`` denominator is an estimated PyTorch DataParallel Mean-Teacher
step rate for DeepLab-v2/ResNet-101 @321, batch 4, on one V100-class GPU
(~1.3 steps/s — double forward + backward + Python-loop EMA + per-forward
scatter/gather). Revisit when a measured torch-GPU number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


BASELINE_STEPS_PER_SEC = 1.3  # estimated torch DataParallel MT step rate


def main():
    import jax
    from pixelssl_tpu import harness, parallel

    mesh = parallel.make_mesh()
    n_dev = mesh.devices.size

    args = harness.default_args(
        'ssl_mt',
        backbone='resnet101', im_size=321, num_classes=21,
        batch_size=4 * n_dev, unlabeled_batch_size=2 * n_dev,
        ignore_unlabeled=False,
        cons_scale=10.0, cons_rampup_epochs=5, ema_decay=0.999,
        lr=0.0025, momentum=0.9, weight_decay=0.0005, epochs=40)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=100)
    batch = harness.synthetic_batch(args, mesh)

    state = algo.state
    # warmup (compile + first steps)
    for _ in range(3):
        state, metrics = algo._train_step(state, batch)
    jax.block_until_ready(metrics)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = algo._train_step(state, batch)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    steps_per_sec_per_chip = n_steps / dt / n_dev
    print(json.dumps({
        'metric': 'ssl_mt_deeplabv2_r101_321_b4_train_steps_per_sec_per_chip',
        'value': round(steps_per_sec_per_chip, 4),
        'unit': 'steps/s/chip',
        'vs_baseline': round(steps_per_sec_per_chip / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
