"""torch → JAX pretrained-weight conversion.

The reference loads ImageNet/COCO-pretrained torch ResNet state dicts into
its backbone (reference: task/sseg/module/backbone/resnet.py:145-156,
task/sseg/model.py:69-99 lists the checkpoint URLs). Hitting the published
mIoU numbers requires the same initialization, so this module maps a torch
``state_dict`` (as a dict of numpy arrays) onto the flax param/batch-stats
trees of models/resnet.ResNet:

* conv weights OIHW → HWIO transpose;
* ``layer{X}.{Y}.convZ/bnZ`` → ``layer{X}_{Y}`` Bottleneck submodules;
* ``downsample.0/.1`` → ``downsample_conv``/``downsample_bn``;
* BN weight/bias → scale/bias params, running_mean/var → batch_stats.

Loading is *partial* like the reference (:150-154): keys present in the
torch dict that match a target leaf are copied; everything else keeps its
fresh initialization (e.g. the COCO checkpoint's 21-class head is dropped
when shapes mismatch).
"""

import re

import numpy as np

from ..utils import logger


def load_torch_state_dict(path):
    """Read a .pth/.ckpt file into {name: numpy array} (CPU, no grad)."""
    import torch
    state = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(state, dict) and 'state_dict' in state:
        state = state['state_dict']
    out = {}
    for k, v in state.items():
        k = k[len('module.'):] if k.startswith('module.') else k
        if hasattr(v, 'detach'):
            out[k] = v.detach().cpu().numpy()
    return out


def _torch_key_to_flax(key):
    """Map a torch ResNet state_dict key to (flax path tuple, kind).

    kind ∈ {'conv', 'bn_scale', 'bn_bias', 'bn_mean', 'bn_var', None}.
    """
    parts = key.split('.')

    # stem
    if key.startswith('conv1.'):
        return ('conv1', 'kernel'), 'conv'
    if key.startswith('bn1.'):
        return ('bn1',), _bn_kind(parts[-1])

    m = re.match(r'layer(\d)\.(\d+)\.(.*)', key)
    if not m:
        return None, None
    block = 'layer{0}_{1}'.format(m.group(1), m.group(2))
    rest = m.group(3).split('.')

    if rest[0].startswith('conv'):
        return (block, rest[0], 'kernel'), 'conv'
    if rest[0].startswith('bn'):
        return (block, rest[0]), _bn_kind(rest[-1])
    if rest[0] == 'downsample':
        if rest[1] == '0':
            return (block, 'downsample_conv', 'kernel'), 'conv'
        if rest[1] == '1':
            return (block, 'downsample_bn'), _bn_kind(rest[-1])
    return None, None


def _bn_kind(leaf):
    return {'weight': 'bn_scale', 'bias': 'bn_bias',
            'running_mean': 'bn_mean', 'running_var': 'bn_var'}.get(leaf)


def convert_resnet_backbone(torch_state, params, batch_stats,
                            verbose=False):
    """Copy a torch ResNet state dict into flax (params, batch_stats) trees.

    ``params``/``batch_stats`` are the *backbone subtree* (the tree that
    contains conv1/bn1/layerX_Y). Returns new trees + stats of what matched.
    """
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    n_copied, n_skipped = 0, 0

    def assign(tree, path, value):
        node = tree
        for p in path[:-1]:
            if p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            return False
        if node[leaf].shape != value.shape:
            return False
        node[leaf] = value.astype(node[leaf].dtype)
        return True

    for key, value in torch_state.items():
        path, kind = _torch_key_to_flax(key)
        if path is None or kind is None:
            n_skipped += 1
            continue
        if kind == 'conv':
            value = np.transpose(value, (2, 3, 1, 0))  # OIHW → HWIO
            ok = assign(params, path, value)
        elif kind == 'bn_scale':
            ok = assign(params, path + ('scale',), value)
        elif kind == 'bn_bias':
            ok = assign(params, path + ('bias',), value)
        elif kind == 'bn_mean':
            ok = assign(batch_stats, path + ('mean',), value)
        elif kind == 'bn_var':
            ok = assign(batch_stats, path + ('var',), value)
        else:
            ok = False
        if ok:
            n_copied += 1
        else:
            n_skipped += 1
            if verbose:
                logger.log_warn('convert: skipped {0}'.format(key))

    logger.log_info('convert_resnet_backbone: copied {0} tensors, '
                    'skipped {1}'.format(n_copied, n_skipped))
    return params, batch_stats, n_copied


def load_pretrained_backbone(variables, pth_path, backbone_path=('net', 'backbone_net')):
    """Load a torch ResNet checkpoint into a full model's variables.

    ``backbone_path`` locates the backbone subtree inside params/batch_stats
    (for the sseg wrappers: _SsegModule 'net' → DeepLabV2/PSPNet
    'backbone_net').
    """
    torch_state = load_torch_state_dict(pth_path)

    def get_sub(tree):
        node = tree
        for p in backbone_path:
            node = node[p]
        return node

    def set_sub(tree, sub):
        node = tree
        for p in backbone_path[:-1]:
            node = node[p]
        node[backbone_path[-1]] = sub
        return tree

    import jax
    variables = jax.tree.map(np.asarray, dict(variables))
    params = dict(variables['params'])
    batch_stats = dict(variables.get('batch_stats', {}))

    bb_params, bb_stats, n = convert_resnet_backbone(
        torch_state, get_sub(params), get_sub(batch_stats))
    if n == 0:
        logger.log_warn('load_pretrained_backbone: no tensors matched — '
                        'wrong checkpoint or backbone path?')
    set_sub(params, bb_params)
    set_sub(batch_stats, bb_stats)
    variables['params'] = params
    variables['batch_stats'] = batch_stats
    return variables


# ---------------------------------------------------------------------------
# Full-model converters (reference published checkpoints:
# task/sseg/README.md download table; state dicts of task/sseg/model.py
# wrappers whose inner module is `model.`)
# ---------------------------------------------------------------------------

def _strip_prefix(state, prefix):
    out = {}
    for k, v in state.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def _assign_leaf(tree, path, value, stats):
    node = tree
    for p in path[:-1]:
        if p not in node:
            stats[1] += 1
            return
        node = node[p]
    leaf = path[-1]
    if leaf in node and node[leaf].shape == value.shape:
        node[leaf] = value.astype(node[leaf].dtype)
        stats[0] += 1
    else:
        stats[1] += 1


def _conv_w(v):
    return np.transpose(v, (2, 3, 1, 0))  # OIHW → HWIO


def _convert_bn(params, batch_stats, path, prefix, torch_state, stats):
    for tleaf, tree, jleaf in (('weight', params, 'scale'),
                               ('bias', params, 'bias'),
                               ('running_mean', batch_stats, 'mean'),
                               ('running_var', batch_stats, 'var')):
        key = prefix + '.' + tleaf
        if key in torch_state:
            _assign_leaf(tree, path + (jleaf,), torch_state[key], stats)


def convert_deeplab_v2(torch_state, variables):
    """Map a torch DeepLabV2 state dict (task/sseg/module/deeplab_v2.py
    layout: backbone.* + classifier.conv2d_list.{i}.*) onto the flax
    DeepLabV2 variables ({'net': {'backbone_net', 'classifier'}} under the
    sseg wrapper, or top-level when converting the bare module)."""
    import jax
    variables = jax.tree.map(np.asarray, dict(variables))
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    root_p = params['net'] if 'net' in params else params
    root_s = batch_stats.get('net', batch_stats)

    if any(k.startswith('model.') for k in torch_state):
        torch_state = _strip_prefix(torch_state, 'model.')

    bb_state = _strip_prefix(torch_state, 'backbone.')
    bb_p, bb_s, n = convert_resnet_backbone(
        bb_state, root_p['backbone_net'], root_s['backbone_net'])
    root_p['backbone_net'] = bb_p
    root_s['backbone_net'] = bb_s

    stats = [n, 0]
    for k, v in _strip_prefix(torch_state, 'classifier.').items():
        m = re.match(r'conv2d_list\.(\d+)\.(weight|bias)', k)
        if not m:
            stats[1] += 1
            continue
        name = 'conv2d_list_{0}'.format(m.group(1))
        if m.group(2) == 'weight':
            _assign_leaf(root_p['classifier'], (name, 'kernel'), _conv_w(v), stats)
        else:
            _assign_leaf(root_p['classifier'], (name, 'bias'), v, stats)

    logger.log_info('convert_deeplab_v2: copied {0}, skipped {1}'.format(*stats))
    variables['params'] = params
    variables['batch_stats'] = batch_stats
    return variables


def convert_pspnet(torch_state, variables):
    """Map a torch _PSPNet state dict (task/sseg/module/_pspnet.py layout:
    backbone.* + psp.stages.{i}.{1,2}.* + psp.bottleneck.{0,1}.* +
    decoder.{0|k.conv}.*) onto the flax PSPNet variables."""
    import jax
    variables = jax.tree.map(np.asarray, dict(variables))
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    root_p = params['net'] if 'net' in params else params
    root_s = batch_stats.get('net', batch_stats)

    if any(k.startswith('model.') for k in torch_state):
        torch_state = _strip_prefix(torch_state, 'model.')

    bb_state = _strip_prefix(torch_state, 'backbone.')
    bb_p, bb_s, n = convert_resnet_backbone(
        bb_state, root_p['backbone_net'], root_s['backbone_net'])
    root_p['backbone_net'] = bb_p
    root_s['backbone_net'] = bb_s
    stats = [n, 0]

    psp = _strip_prefix(torch_state, 'psp.')
    for k, v in psp.items():
        m = re.match(r'stages\.(\d+)\.1\.weight', k)
        if m:
            _assign_leaf(root_p['psp'],
                         ('stages_{0}_conv'.format(m.group(1)), 'kernel'),
                         _conv_w(v), stats)
            continue
        m = re.match(r'stages\.(\d+)\.2\.(.+)', k)
        if m:
            _convert_bn(root_p['psp'], root_s['psp'],
                        ('stages_{0}_bn'.format(m.group(1)),),
                        'stages.{0}.2'.format(m.group(1)), psp, stats)
            continue
    if 'bottleneck.0.weight' in psp:
        _assign_leaf(root_p['psp'], ('bottleneck_conv', 'kernel'),
                     _conv_w(psp['bottleneck.0.weight']), stats)
    _convert_bn(root_p['psp'], root_s['psp'], ('bottleneck_bn',),
                'bottleneck.1', psp, stats)

    dec = _strip_prefix(torch_state, 'decoder.')
    if '0.weight' in dec:
        _assign_leaf(root_p['decoder'], ('conv1x1', 'kernel'),
                     _conv_w(dec['0.weight']), stats)
    for i in range(3):
        key_w = '{0}.conv.weight'.format(i + 1)
        key_b = '{0}.conv.bias'.format(i + 1)
        if key_w in dec:
            _assign_leaf(root_p['decoder'],
                         ('shuffle_{0}'.format(i), 'conv', 'kernel'),
                         _conv_w(dec[key_w]), stats)
        if key_b in dec:
            _assign_leaf(root_p['decoder'],
                         ('shuffle_{0}'.format(i), 'conv', 'bias'),
                         dec[key_b], stats)

    logger.log_info('convert_pspnet: copied {0}, skipped {1}'.format(*stats))
    variables['params'] = params
    variables['batch_stats'] = batch_stats
    return variables
