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
        get_sub(params), get_sub(batch_stats))
    if n == 0:
        logger.log_warn('load_pretrained_backbone: no tensors matched — '
                        'wrong checkpoint or backbone path?')
    set_sub(params, bb_params)
    set_sub(batch_stats, bb_stats)
    variables['params'] = params
    variables['batch_stats'] = batch_stats
    return variables
