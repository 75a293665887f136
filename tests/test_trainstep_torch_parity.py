"""Composed TRAIN-STEP parity vs torch: forward (train-mode BN) + CE +
backward + SGD(momentum, wd) with 10x-lr classifier group + per-iter
polynomial lr + BN running-stat updates, over several steps.

The unit-level pieces are covered elsewhere (test_convert: backbone
forward + SGD semantics; test_criterion_parity: CE; test_lrer_torch_parity:
schedules). This test composes them end-to-end through the fused
``ssl_null`` step — the strongest egress-free evidence that a training run
reproduces the reference's torch numerics (reference train loop:
pixelssl/ssl_algorithm/ssl_null.py:86-144; GPU/lr scaling and param
groups: task/sseg/model.py:45-48)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax

from test_convert import _build_torch_resnet10

N_STEPS = 5
LR = 2.5e-4  # the reference recipe's lr — keeps the trajectory stable, so
             # fp32 reduction-order noise is not chaotically amplified
MOMENTUM = 0.9
WEIGHT_DECAY = 5e-4
POWER = 0.9
NUM_CLASSES = 5
IM = 32
BATCH = 4
MAX_ITERS = 20  # iters_per_epoch * epochs on both sides


class _TorchDeepLab(torch.nn.Module):
    """Torch twin of tasks/sseg DeepLab-v2 with the resnet10 backbone:
    ASPP = 4 parallel dilated 3x3 convs summed (reference
    task/sseg/module/deeplab_v2.py:71-85) + align_corners bilinear."""

    def __init__(self):
        super().__init__()
        self.backbone = _build_torch_resnet10()
        self.classifier = torch.nn.Module()
        self.classifier.conv2d_list = torch.nn.ModuleList([
            torch.nn.Conv2d(2048, NUM_CLASSES, 3, padding=d, dilation=d,
                            bias=True)
            for d in (6, 12, 18, 24)])

    def forward(self, x):
        f = self.backbone(x)
        out = self.classifier.conv2d_list[0](f)
        for conv in self.classifier.conv2d_list[1:]:
            out = out + conv(f)
        return torch.nn.functional.interpolate(
            out, size=x.shape[2:], mode='bilinear', align_corners=True)


def _torch_train(tnet, images, labels):
    """N_STEPS of the reference recipe; returns per-step losses."""
    tnet.train()
    opt = torch.optim.SGD(
        [{'params': tnet.backbone.parameters(), 'lr': LR},
         {'params': tnet.classifier.parameters(), 'lr': LR * 10.0}],
        lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda it: (1.0 - it / MAX_ITERS) ** POWER)
    losses = []
    xt = torch.from_numpy(images).permute(0, 3, 1, 2)
    yt = torch.from_numpy(labels).long()
    for _ in range(N_STEPS):
        opt.zero_grad()
        logits = tnet(xt)
        per_pix = torch.nn.functional.cross_entropy(
            logits, yt, ignore_index=255, reduction='none')
        # reference criterion: ignored pixels are 0 in the sum but count in
        # the denominator (task/sseg/criterion.py:21-38)
        loss = per_pix.mean(dim=(1, 2)).mean()
        loss.backward()
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))
    return losses


def test_suponly_trainstep_matches_torch():
    from pixelssl_tpu import harness, parallel
    from pixelssl_tpu.models.convert import convert_deeplab_v2

    torch.manual_seed(0)
    tnet = _TorchDeepLab()
    # non-trivial BN running stats so the eval branch would differ if the
    # train branch ever used them
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(42)
    images = rng.standard_normal((BATCH, IM, IM, 3)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, (BATCH, IM, IM)).astype(np.int32)
    labels[:, :4, :4] = 255  # exercise ignore_index on both sides

    args = harness.default_args(
        'ssl_null', backbone='resnet10', im_size=IM, num_classes=NUM_CLASSES,
        batch_size=BATCH, unlabeled_batch_size=0, ignore_unlabeled=True,
        bf16=False, lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY,
        power=POWER, epochs=2)
    mesh = parallel.make_mesh(1)
    algo = harness.build_algorithm(args, mesh=mesh, iters_per_epoch=10)
    assert MAX_ITERS == 10 * args.epochs

    # torch weights -> the algorithm's state pytree
    torch_state = {k: v.detach().numpy() for k, v in
                   tnet.state_dict().items()}
    model_vars = {'params': algo.state['model']['params']['net'],
                  'batch_stats': algo.state['model']['batch_stats']['net']}
    converted = convert_deeplab_v2(torch_state, model_vars)
    state = jax.device_get(algo.state)
    state['model']['params']['net'] = converted['params']
    state['model']['batch_stats']['net'] = converted['batch_stats']
    state = jax.device_put(state, parallel.replicate_sharding(mesh))

    batch = parallel.shard_batch({'inp': (images,), 'gt': (labels,)}, mesh)
    jax_losses = []
    for _ in range(N_STEPS):
        state, metrics = algo._train_step(state, batch)
        jax_losses.append(float(np.asarray(metrics['task_loss'])))

    torch_losses = _torch_train(tnet, images, labels)

    # fp32 CPU conv stacks differ in reduction order; the trajectories must
    # track each other step for step as the polynomial lr decays
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)

    # terminal params: spot-check the stem conv and one ASPP branch after
    # N momentum+wd updates through both frameworks
    final = jax.device_get(state['model']['params']['net'])
    stem = np.asarray(final['backbone_net']['conv1']['kernel'])
    t_stem = tnet.backbone.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(stem, t_stem, atol=3e-4)
    aspp = np.asarray(final['classifier']['conv2d_list_0']['kernel'])
    t_aspp = (tnet.classifier.conv2d_list[0].weight.detach().numpy()
              .transpose(2, 3, 1, 0))
    np.testing.assert_allclose(aspp, t_aspp, atol=3e-4)

    # BN running stats followed the same unbiased-update rule
    bn_mean = np.asarray(
        jax.device_get(state['model']['batch_stats']['net'])
        ['backbone_net']['bn1']['mean'])
    t_bn_mean = tnet.backbone.bn1.running_mean.detach().numpy()
    np.testing.assert_allclose(bn_mean, t_bn_mean, atol=1e-4)
