"""Composed GCT TRAIN-STEP parity vs torch (round-2 verdict item #2).

The fused 3-phase GCT step (ssl_algorithm/ssl_gct.py:253-408) is the most
intricate program in the framework: no-grad pre-forwards, 2 FD forwards,
FlawmapHandler + DCGT pipelines, two task-model grad steps with fc/dc
losses against a frozen FD, and an FD Adam step against the FDGT pipeline
(reference pixelssl/ssl_algorithm/ssl_gct.py:176-298,624-728). This test
rebuilds the whole iteration in torch — models, IBNorm flaw detector,
blur/dilate pipelines, SGD + Adam(0.9,0.99) with per-iter polynomial lr —
and checks losses, terminal params and BN stats over 2 full steps.

Mask caveat: DCGT/fc_mask come from HARD thresholds on blurred, min-max
normalized flawmaps; a pixel within fp32 noise of the threshold can flip
between the two frameworks, so the fc/dc tolerances are looser than the
CE/FD ones (each flip moves a 4096-pixel mean by ~2e-4 relative).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax

from test_convert import _build_torch_resnet10
from test_trainstep_torch_parity import _TorchDeepLab

N_STEPS = 2
LR = 2.5e-4
MOMENTUM = 0.9
WEIGHT_DECAY = 5e-4
POWER = 0.9
NUM_CLASSES = 5
# 96, not 64: the flaw detector's conv chain (five stride-2 + three
# shrink-by-1 stride-1 4x4 convs) collapses a 64px input to a 1x1
# pre-upsample map — spatially CONSTANT flawmaps whose min-max
# normalization amplifies last-ulp fp noise into O(1) mask differences
# between frameworks (measured: handler output 0.97 vs 0.0 on a map with
# 3e-8 spatial range). 96px gives a 2x2 map with real structure, so the
# threshold masks are well-conditioned on both sides. A second test runs
# ONE composed step at 161px (4x4 FD map, blur kernels 11/21/41 — the
# same large-kernel regime as the 321px benchmark) per round-3 verdict
# item #5.
IM = 96
BATCH = 4
LBS = 2
ITERS_PER_EPOCH = 10
MAX_ITERS = 20

FD_LR = 1e-4
FC_SCALE = 2.0
DC_SCALE = 1.5
DC_THRESHOLD = 0.5
MU = 0.5
NU = 1


# ---------------------------------------------------------------------------
# torch twins of the GCT auxiliary pieces
# ---------------------------------------------------------------------------

class _TorchIBNorm(torch.nn.Module):
    """BatchNorm on the first half of channels ‖ affine-free InstanceNorm
    on the rest (reference ssl_gct.py:588-607)."""

    def __init__(self, ch):
        super().__init__()
        self.half = int(ch * 0.5 + 0.5)
        self.bn = torch.nn.BatchNorm2d(self.half)

    def forward(self, x):
        xb = self.bn(x[:, :self.half])
        xi = torch.nn.functional.instance_norm(x[:, self.half:], eps=1e-5)
        return torch.cat([xb, xi], dim=1)


class _TorchFlawDetector(torch.nn.Module):
    """Twin of models/flaw_detector.FlawDetector (reference
    ssl_gct.py:539-587): 7 4x4 IBNorm+LeakyReLU(0.2) convs + strided
    classifier + align_corners bilinear upsample to input size."""

    def __init__(self, in_ch, ndf=64):
        super().__init__()
        spec = [('conv1', in_ch, ndf, 2), ('conv2', ndf, ndf * 2, 2),
                ('conv2_1', ndf * 2, ndf * 2, 1),
                ('conv3', ndf * 2, ndf * 4, 2),
                ('conv3_1', ndf * 4, ndf * 4, 1),
                ('conv4', ndf * 4, ndf * 8, 2),
                ('conv4_1', ndf * 8, ndf * 8, 1)]
        for name, ci, co, s in spec:
            setattr(self, name, torch.nn.Conv2d(ci, co, 4, stride=s,
                                                padding=1))
            setattr(self, 'ibn' + name[4:], _TorchIBNorm(co))
        self.spec = [n for n, _, _, _ in spec]
        self.classifier = torch.nn.Conv2d(ndf * 8, 1, 4, stride=2, padding=1)

    def forward(self, inp, pred):
        x = torch.cat([inp, pred], dim=1)
        for name in self.spec:
            x = getattr(self, name)(x)
            x = getattr(self, 'ibn' + name[4:])(x)
            x = torch.nn.functional.leaky_relu(x, 0.2)
        x = self.classifier(x)
        return torch.nn.functional.interpolate(
            x, size=(inp.shape[2], inp.shape[3]), mode='bilinear',
            align_corners=True)


def _blur_t(x, kernel_size):
    """Separable reflect-pad Gaussian blur with the reference's scipy
    kernel recipe (gaussian_kernel_1d is scipy-parity-tested in
    tests/test_nn.py; reference gaussian_blur.py:56-64)."""
    from pixelssl_tpu.nn.module.gaussian_blur import gaussian_kernel_1d

    k = torch.from_numpy(np.asarray(gaussian_kernel_1d(kernel_size)))
    c = x.shape[1]
    half = kernel_size // 2
    xp = torch.nn.functional.pad(x, (0, 0, half, half), mode='reflect')
    w = k.view(1, 1, kernel_size, 1).repeat(c, 1, 1, 1)
    x = torch.nn.functional.conv2d(xp, w, groups=c)
    xp = torch.nn.functional.pad(x, (half, half, 0, 0), mode='reflect')
    w = k.view(1, 1, 1, kernel_size).repeat(c, 1, 1, 1)
    return torch.nn.functional.conv2d(xp, w, groups=c)


def _odd(k):
    return k + 1 if k % 2 == 0 else k


def _flawmap_handler_t(fm, im_size, clip_threshold=0.1):
    fm = fm.detach().clamp(min=0)
    fm = _blur_t(fm, _odd(int(im_size / 16)))
    fmax = fm.amax(dim=(1, 2, 3), keepdim=True)
    fmin = fm.amin(dim=(1, 2, 3), keepdim=True)
    fm = fm * (fmax > clip_threshold).float()
    return (fm - fmin) / (fmax - fmin + 1e-9)


def _dcgt_generator_t(l_pred, r_pred, l_fm, r_fm, thr):
    l_bad, r_bad = l_fm > thr, r_fm > thr
    both_bad = (l_bad & r_bad).float()
    l_h = torch.where(l_bad, torch.ones_like(l_fm), l_fm)
    r_h = torch.where(r_bad, torch.ones_like(r_fm), r_fm)
    l_mask = (r_h >= l_h).float()
    r_mask = (l_h >= r_h).float()
    l_dc_gt = l_mask * l_pred + (1.0 - l_mask) * r_pred
    r_dc_gt = r_mask * r_pred + (1.0 - r_mask) * l_pred
    return l_dc_gt, r_dc_gt, both_bad


def _fdgt_generator_t(pred, gt_onehot, im_size, mu, nu):
    diff = (gt_onehot - pred.detach()).abs().sum(dim=1, keepdim=True) * mu
    diff = _blur_t(diff, _odd(int(im_size / 8)))
    for _ in range(nu):
        dil = torch.nn.functional.max_pool2d(
            torch.nn.functional.pad(diff, (1, 1, 1, 1), mode='reflect'),
            3, stride=1)
        diff = _blur_t(dil, _odd(int(im_size / 4)))
    dmax = diff.amax(dim=(1, 2, 3), keepdim=True)
    dmin = diff.amin(dim=(1, 2, 3), keepdim=True)
    return (diff - dmin) / (dmax - dmin + 1e-9)


def _onehot_ignore_t(y, num_classes, ignore_index=255):
    keep = (y != ignore_index)
    oh = torch.nn.functional.one_hot(
        torch.where(keep, y, torch.zeros_like(y)), num_classes).float()
    return (oh * keep.unsqueeze(-1).float()).permute(0, 3, 1, 2)


def _copy_fd_jax_to_torch(fd_params, fd_stats, tfd):
    """Mirror the flax FlawDetector init into the torch twin."""
    with torch.no_grad():
        for name in tfd.spec + ['classifier']:
            conv = getattr(tfd, name)
            p = fd_params[name]
            conv.weight.copy_(torch.from_numpy(
                np.asarray(p['kernel']).transpose(3, 2, 0, 1)))
            conv.bias.copy_(torch.from_numpy(np.asarray(p['bias'])))
            if name == 'classifier':
                continue
            ibn = getattr(tfd, 'ibn' + name[4:])
            jb = fd_params['ibn' + name[4:]]['bnorm']
            sb = fd_stats['ibn' + name[4:]]['bnorm']
            ibn.bn.weight.copy_(torch.from_numpy(np.asarray(jb['scale'])))
            ibn.bn.bias.copy_(torch.from_numpy(np.asarray(jb['bias'])))
            ibn.bn.running_mean.copy_(
                torch.from_numpy(np.asarray(sb['mean'])))
            ibn.bn.running_var.copy_(torch.from_numpy(np.asarray(sb['var'])))


def _ce_t(logits, y):
    per_pix = torch.nn.functional.cross_entropy(
        logits, y, ignore_index=255, reduction='none')
    return per_pix.mean(dim=(1, 2)).mean()


def _sigmoid_rampup(cur, total):
    cur = float(np.clip(cur, 0.0, total))
    phase = 1.0 - cur / total
    return float(np.exp(-5.0 * phase * phase))


def _torch_gct_train(tl, tr, tfd, images, labels,
                     n_steps=N_STEPS, im=IM, lbs=LBS):
    """n_steps of the reference 3-phase GCT iteration; returns per-step
    metric dicts (reference ssl_gct.py:176-298)."""
    xt = torch.from_numpy(images).permute(0, 3, 1, 2)
    yt = torch.from_numpy(labels).long()
    gt_oh = _onehot_ignore_t(yt[:lbs], NUM_CLASSES)

    def sgd(net):
        return torch.optim.SGD(
            [{'params': net.backbone.parameters(), 'lr': LR},
             {'params': net.classifier.parameters(), 'lr': LR * 10.0}],
            lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY)

    l_opt, r_opt = sgd(tl), sgd(tr)
    fd_opt = torch.optim.Adam(tfd.parameters(), lr=FD_LR, betas=(0.9, 0.99))
    scheds = [torch.optim.lr_scheduler.LambdaLR(
        o, lambda it: (1.0 - it / MAX_ITERS) ** POWER)
        for o in (l_opt, r_opt, fd_opt)]
    for net in (tl, tr, tfd):
        net.train()

    rows = []
    for s in range(n_steps):
        m = {}
        rampup = _sigmoid_rampup(s, float(ITERS_PER_EPOCH))
        # phase 0: no-grad pre-forwards (BN stats update) + FD forwards
        # that stay in the graph for the FD step (reference backprops
        # through the step-0 FD forwards)
        with torch.no_grad():
            l_act0 = torch.softmax(tl(xt), dim=1)
            r_act0 = torch.softmax(tr(xt), dim=1)
        fm_l0 = tfd(xt, l_act0)
        fm_r0 = tfd(xt, r_act0)
        l_h = _flawmap_handler_t(fm_l0, im)
        r_h = _flawmap_handler_t(fm_r0, im)
        l_dc_gt, r_dc_gt, both_bad = _dcgt_generator_t(
            l_act0, r_act0, l_h, r_h, DC_THRESHOLD)

        # phase 1: task models with FD frozen
        for fp in tfd.parameters():
            fp.requires_grad_(False)
        for mid, net, opt, dc_gt in (('l', tl, l_opt, l_dc_gt),
                                     ('r', tr, r_opt, r_dc_gt)):
            opt.zero_grad()
            logits = net(xt)
            act = torch.softmax(logits, dim=1)
            fm = tfd(xt, act)
            task_loss = _ce_t(logits[:lbs], yt[:lbs])
            fc = both_bad * fm ** 2
            fc_loss = FC_SCALE * fc.mean(dim=(1, 2, 3)).mean()
            dc = ((act - dc_gt) ** 2).mean(dim=(1, 2, 3))
            dc_loss = rampup * DC_SCALE * dc.mean()
            (task_loss + fc_loss + dc_loss).backward()
            opt.step()
            m[mid + '_task_loss'] = float(task_loss.detach())
            m[mid + '_fc_loss'] = float(fc_loss.detach())
            m[mid + '_dc_loss'] = float(dc_loss.detach())
        for fp in tfd.parameters():
            fp.requires_grad_(True)

        # phase 2: FD on the labeled slice of the phase-0 flawmaps
        l_fdgt = _fdgt_generator_t(l_act0[:lbs], gt_oh, im, MU, NU)
        r_fdgt = _fdgt_generator_t(r_act0[:lbs], gt_oh, im, MU, NU)
        fd_opt.zero_grad()
        l_fd = ((fm_l0[:lbs] - l_fdgt) ** 2).mean(dim=(1, 2, 3)).mean()
        r_fd = ((fm_r0[:lbs] - r_fdgt) ** 2).mean(dim=(1, 2, 3)).mean()
        ((l_fd + r_fd) / 2.0).backward()
        fd_opt.step()
        m['l_fd_loss'] = float(l_fd.detach())
        m['r_fd_loss'] = float(r_fd.detach())

        for sc in scheds:
            sc.step()
        rows.append(m)
    return rows


METRIC_KEYS = ('l_task_loss', 'r_task_loss', 'l_fc_loss', 'r_fc_loss',
               'l_dc_loss', 'r_dc_loss', 'l_fd_loss', 'r_fd_loss')


def _run_gct_parity(im, batch_n, lbs, n_steps, tol_soft):
    """Composed GCT parity at the given size; returns (final jax state,
    torch nets) so callers can extend the terminal-param checks."""
    from pixelssl_tpu import harness, parallel
    from pixelssl_tpu.models.convert import convert_deeplab_v2

    torch.manual_seed(3)
    tl, tr = _TorchDeepLab(), _TorchDeepLab()
    for net in (tl, tr):
        for mod in net.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(11)
    images = rng.standard_normal((batch_n, im, im, 3)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, (batch_n, im, im)).astype(np.int32)
    labels[:, :4, :4] = 255

    args = harness.default_args(
        'ssl_gct', backbone='resnet10', im_size=im, num_classes=NUM_CLASSES,
        batch_size=batch_n, unlabeled_batch_size=batch_n - lbs,
        ignore_unlabeled=False, bf16=False,
        lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY, power=POWER,
        epochs=2, ssl_mode='gct', fc_ssl_scale=FC_SCALE,
        dc_ssl_scale=DC_SCALE, dc_threshold=DC_THRESHOLD,
        dc_rampup_epochs=1, fd_lr=FD_LR, fd_scale=1.0, mu=MU, nu=NU)
    mesh = parallel.make_mesh(1)
    algo = harness.build_algorithm(args, mesh=mesh,
                                   iters_per_epoch=ITERS_PER_EPOCH)

    state = jax.device_get(algo.state)
    # torch task-model weights -> l_model / r_model
    for key, net in (('l_model', tl), ('r_model', tr)):
        tstate = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        conv = convert_deeplab_v2(tstate, {
            'params': state[key]['params']['net'],
            'batch_stats': state[key]['batch_stats']['net']})
        state[key]['params']['net'] = conv['params']
        state[key]['batch_stats']['net'] = conv['batch_stats']
    # flax FD init -> the torch twin (reverse direction: FD has no
    # published checkpoints, parity only needs identical weights)
    tfd = _TorchFlawDetector(in_ch=3 + NUM_CLASSES)
    _copy_fd_jax_to_torch(state['fd_model']['params'],
                          state['fd_model']['batch_stats'], tfd)
    state = jax.device_put(state, parallel.replicate_sharding(mesh))

    batch = parallel.shard_batch({'inp': (images,), 'gt': (labels,)}, mesh)
    jax_rows = []
    for _ in range(n_steps):
        state, metrics = algo._train_step(state, batch)
        jax_rows.append({k: float(np.asarray(metrics[k]))
                         for k in METRIC_KEYS})

    torch_rows = _torch_gct_train(tl, tr, tfd, images, labels,
                                  n_steps=n_steps, im=im, lbs=lbs)

    for s in range(n_steps):
        for k in METRIC_KEYS:
            a, b = jax_rows[s][k], torch_rows[s][k]
            # CE / FD MSE are threshold-free -> tight; fc/dc go through
            # hard masks on blurred normalized flawmaps -> looser (see
            # module docstring)
            tol = 2e-3 if ('task' in k or 'fd' in k) else tol_soft
            assert np.isclose(a, b, rtol=tol, atol=1e-6), (s, k, a, b)
    return jax.device_get(state), tl, tr, tfd


def test_gct_trainstep_matches_torch():
    final, tl, tr, tfd = _run_gct_parity(
        IM, BATCH, LBS, N_STEPS, tol_soft=2e-2)

    # terminal task-model params after 2 SGD(momentum, wd, poly-lr) steps
    for key, net in (('l_model', tl), ('r_model', tr)):
        stem = np.asarray(final[key]['params']['net']
                          ['backbone_net']['conv1']['kernel'])
        t_stem = net.backbone.conv1.weight.detach().numpy().transpose(
            2, 3, 1, 0)
        np.testing.assert_allclose(stem, t_stem, atol=3e-4)
        bn_mean = np.asarray(final[key]['batch_stats']['net']
                             ['backbone_net']['bn1']['mean'])
        np.testing.assert_allclose(
            bn_mean, net.backbone.bn1.running_mean.detach().numpy(),
            atol=1e-4)

    # terminal FD params after 2 Adam(0.9,0.99, poly-lr) steps — proves
    # the optax chain == torch.optim.Adam and the FDGT pipeline parity
    fd_final = final['fd_model']['params']
    w = np.asarray(fd_final['conv1']['kernel']).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(w, tfd.conv1.weight.detach().numpy(),
                               atol=5e-4)
    w = np.asarray(fd_final['classifier']['kernel']).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(w, tfd.classifier.weight.detach().numpy(),
                               atol=5e-4)
    # FD BN running stats chained through the 4 train-mode forwards per
    # step (step-0 l, step-0 r, step-1 l, step-1 r) in the same order
    sb = final['fd_model']['batch_stats']['ibn1']['bnorm']
    np.testing.assert_allclose(
        np.asarray(sb['mean']), tfd.ibn1.bn.running_mean.detach().numpy(),
        atol=1e-4)


def test_gct_trainstep_matches_torch_161px():
    """One composed 3-phase step at 161px (round-3 verdict item #5): the
    FD conv chain yields a 4x4 pre-upsample map and the pipeline blur
    kernels are odd(161/16)=11, odd(161/8)=21, odd(161/4)=41 — the same
    large-kernel FlawmapHandler / FDGT regime the 321px benchmark runs
    (odd(321/16)=21 ... odd(321/4)=81), which the 96px test (kernels
    7/13/25) never touches. batch 2 (1 labeled) keeps the CPU cost of the
    resnet10 twins tractable. fc/dc tolerance 1e-2: at 161^2 pixels one
    threshold-mask flip moves the mean ~2.3x less than at 96^2, and the
    measured drift over one step is <2e-3; 1e-2 keeps margin for fp
    variation across hosts while staying 2x tighter than the 96px bound.
    Reference: pixelssl/ssl_algorithm/ssl_gct.py:624-728."""
    final, tl, tr, tfd = _run_gct_parity(
        161, 2, 1, 1, tol_soft=1e-2)

    # terminal spot-checks: one SGD step on the task models, one Adam
    # step on the FD, at the large size
    stem = np.asarray(final['l_model']['params']['net']
                      ['backbone_net']['conv1']['kernel'])
    t_stem = tl.backbone.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(stem, t_stem, atol=3e-4)
    w = np.asarray(final['fd_model']['params']['conv1']['kernel']
                   ).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(w, tfd.conv1.weight.detach().numpy(),
                               atol=5e-4)
