"""One-time FLOP count of the flagship bench step (bench.py config).

The axon TPU platform returns None from Lowered.cost_analysis() and its
compiled-executable analysis underreports conv flops ~20x, so bench.py's
MFU needs the number from a CPU LOWERING of the same program — HLO cost
analysis is platform-independent math. Lower-only would be free, but
building the algorithm runs flax init (one jitted forward) on this 1-core
host, so the probe takes a few minutes; the result is cached to
tools/mt_step_flops.json (committed) and bench.py just reads it.

Usage: python tools/flops_probe.py   # rewrites tools/mt_step_flops.json
"""

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, '..'))

import jax

jax.config.update('jax_platforms', 'cpu')


def main():
    import bench  # noqa: E402 — the config constants live there

    from pixelssl_tpu import harness, parallel

    args = harness.default_args(
        'ssl_mt',
        backbone='resnet101', im_size=321, num_classes=21,
        batch_size=bench.BATCH_PER_CHIP,
        unlabeled_batch_size=bench.UNLABELED_PER_CHIP,
        ignore_unlabeled=False,
        cons_scale=1.0, cons_rampup_epochs=3, ema_decay=0.99,
        lr=0.00025, momentum=0.9, weight_decay=0.0005, epochs=20)
    mesh = parallel.make_mesh(1)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=100)
    batch = harness.synthetic_batch(args, mesh)

    cost = algo._train_step.lower(algo.state, batch).cost_analysis()
    key = 'ssl_mt_deeplabv2_r101_321_b{0}+{1}'.format(
        bench.BATCH_PER_CHIP, bench.UNLABELED_PER_CHIP)
    rec = {key: {'flops': float(cost['flops']),
                 'bytes_accessed': float(cost.get('bytes accessed', -1))}}
    out = os.path.join(_HERE, 'mt_step_flops.json')
    with open(out, 'w') as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
