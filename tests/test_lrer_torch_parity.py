"""Torch cross-check for every scheduler in the lrer registry.

The reference wraps torch.optim.lr_scheduler directly
(reference: pixelssl/nn/lrer.py:51-136), so torch is the ground truth for
what each schedule must emit at every epoch. Our schedules are pure
functions of the global iteration count; epoch-kind schedules must match
torch's per-epoch `.step()` trajectory when evaluated at
`step = epoch * iters_per_epoch`.
"""

import numpy as np
import pytest
import torch

from pixelssl_tpu.nn import lrer as nnlrer


class Args(object):
    def __init__(self, **kw):
        self.last_epoch = -1
        self.step_size = -1
        self.milestones = []
        self.gamma = -1
        self.T_max = -1
        self.eta_min = -1
        self.power = -1
        for k, v in kw.items():
            setattr(self, k, v)


BASE_LR = 0.25
ITERS_PER_EPOCH = 7
EPOCHS = 12


def _torch_lrs(make_sched):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    sched = make_sched(opt)
    lrs = []
    for _ in range(EPOCHS):
        lrs.append(opt.param_groups[0]['lr'])
        opt.step()
        sched.step()
    return lrs


def _ours_lrs(factory):
    sched = factory.make(BASE_LR, iters_per_epoch=ITERS_PER_EPOCH,
                         total_epochs=EPOCHS)
    # evaluate mid-epoch to also cover the step->epoch quantization
    return [float(sched(e * ITERS_PER_EPOCH + 3)) for e in range(EPOCHS)]


@pytest.mark.parametrize('name,args,torch_ctor', [
    ('steplr', Args(step_size=3, gamma=0.2),
     lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=3, gamma=0.2)),
    ('multisteplr', Args(milestones=[2, 5, 9], gamma=0.5),
     lambda o: torch.optim.lr_scheduler.MultiStepLR(
         o, milestones=[2, 5, 9], gamma=0.5)),
    ('exponentiallr', Args(gamma=0.9),
     lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.9)),
    ('cosineannealinglr', Args(T_max=10, eta_min=0.01),
     lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
         o, T_max=10, eta_min=0.01)),
])
def test_epoch_lrer_matches_torch(name, args, torch_ctor):
    factory = getattr(nnlrer, name)(args)
    assert factory.is_epoch_lrer
    np.testing.assert_allclose(_ours_lrs(factory), _torch_lrs(torch_ctor),
                               rtol=1e-6)


def test_polynomial_matches_reference_formula():
    # ITER kind: lr = base * (1 - iter/max_iter)^power stepped every
    # iteration (reference lrer.py:143-179)
    factory = nnlrer.polynomiallr(Args(power=0.9))
    assert not factory.is_epoch_lrer
    sched = factory.make(BASE_LR, ITERS_PER_EPOCH, EPOCHS)
    max_iter = ITERS_PER_EPOCH * EPOCHS
    for it in [0, 1, 13, 40, max_iter - 1, max_iter]:
        expect = BASE_LR * max(0.0, 1.0 - it / max_iter) ** 0.9
        assert float(sched(it)) == pytest.approx(expect, rel=1e-6)
