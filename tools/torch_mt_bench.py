"""Measure a reference-faithful torch Mean-Teacher train step.

Round-2 verdict item #7: ``bench.py``'s ``vs_baseline`` denominator was an
ESTIMATED PyTorch rate; this tool replaces it with a measurement. It
rebuilds the reference's MT iteration exactly (reference
pixelssl/ssl_algorithm/ssl_mt.py:105-196): per-iteration zero_grad,
Gaussian-noised student + teacher forwards in train mode, labeled-slice
CE, full-batch consistency MSE, backward, SGD(momentum, wd, poly-lr with
10x head group), then the Python-loop EMA teacher update — on the real
DeepLab-v2/ResNet-101 at the benchmark 321px shapes (torch twin from
tests/test_fullmodel_parity.py, verified forward-parity against our flax
models).

Hardware note: the reference REQUIRES CUDA GPUs (reference
docs/installation.md:14) which this environment does not have, so the
measurement runs on CPU — wrapped in ``torch.nn.DataParallel`` only when
CUDA exists; on CPU the module is called directly, which UNDERSTATES the
reference's per-iteration scatter/gather overhead, i.e. is conservative
in the reference's favor. Writes ``tools/torch_mt_cpu.json``; bench.py
reports this measured number alongside the TPU rate.

Usage: python tools/torch_mt_bench.py [--steps 3] [--im 321] [--batch 4]
       [--unlabeled 2] [--backbone r101|r10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', 'tests'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--im', type=int, default=321)
    ap.add_argument('--batch', type=int, default=4,
                    help='total per-device batch (reference b4+2 config)')
    ap.add_argument('--unlabeled', type=int, default=2)
    ap.add_argument('--backbone', default='r101', choices=['r101', 'r10'])
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'torch_mt_cpu.json'))
    args = ap.parse_args()

    import numpy as np
    import torch

    from test_fullmodel_parity import _TorchDeepLabV2

    layers = (3, 4, 23) if args.backbone == 'r101' else (1, 1, 1)
    lbs = args.batch - args.unlabeled
    torch.manual_seed(0)
    student = _TorchDeepLabV2(num_classes=21, layers=layers)
    import copy
    teacher = copy.deepcopy(student)
    for p in teacher.parameters():
        p.requires_grad_(False)
    if torch.cuda.is_available():  # reference path: DataParallel wrapping
        student = torch.nn.DataParallel(student).cuda()
        teacher = torch.nn.DataParallel(teacher).cuda()
    student.train()
    teacher.train()

    opt = torch.optim.SGD(
        [{'params': (student.module if hasattr(student, 'module')
                     else student).backbone.parameters(), 'lr': 2.5e-4},
         {'params': (student.module if hasattr(student, 'module')
                     else student).classifier.parameters(),
          'lr': 2.5e-3}],
        lr=2.5e-4, momentum=0.9, weight_decay=5e-4)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda it: (1.0 - it / 1000.0) ** 0.9)

    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.standard_normal(
        (args.batch, 3, args.im, args.im)).astype(np.float32))
    y = torch.from_numpy(rng.integers(
        0, 21, (args.batch, args.im, args.im)).astype(np.int64))

    def step(it):
        opt.zero_grad()
        # reference noises the first input element of both streams
        s_in = x + 0.05 * torch.randn_like(x)
        t_in = x + 0.05 * torch.randn_like(x)
        with torch.no_grad():
            t_pred = teacher(t_in)
        s_pred = student(s_in)
        ce = torch.nn.functional.cross_entropy(
            s_pred[:lbs], y[:lbs], ignore_index=255, reduction='none')
        task_loss = ce.mean(dim=(1, 2)).mean()
        cons = ((s_pred - t_pred) ** 2).mean(dim=(1, 2, 3)).mean()
        (task_loss + cons).backward()
        opt.step()
        sched.step()
        with torch.no_grad():  # reference ssl_mt.py:359-363 Python loop
            decay = min(1.0 - 1.0 / (it + 1.0), 0.999)
            for tp, sp in zip(teacher.parameters(), student.parameters()):
                tp.mul_(decay).add_(sp, alpha=1.0 - decay)
        return float(task_loss.detach())

    step(0)  # warmup (allocator, thread pools)
    t0 = time.perf_counter()
    for it in range(1, args.steps + 1):
        loss = step(it)
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)

    steps_per_sec = args.steps / dt
    result = {
        'metric': 'torch_mt_deeplabv2_{0}_{1}_b{2}+{3}'.format(
            args.backbone, args.im, args.batch, args.unlabeled),
        'steps_per_sec': round(steps_per_sec, 5),
        'samples_per_sec': round(steps_per_sec * args.batch, 4),
        'device': 'cuda' if torch.cuda.is_available() else
                  'cpu ({0} threads)'.format(torch.get_num_threads()),
        'n_steps': args.steps,
    }
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
