"""Rescore a published reference (torch) checkpoint with the TPU framework.

Usage::

    python scripts/rescore.py deeplabv2_pascalvoc_1-8_suponly \
        --torch-ckpt /path/to/deeplabv2_pascalvoc_1-8_suponly.ckpt \
        [--voc-root dataset/PascalVOC/VOCdevkit/VOC2012] [--no-save]

This is the mIoU fidelity gate staged end-to-end (reference:
task/sseg/README.md:18-40 — published checkpoints are validated
out-of-the-box by the benchmark scripts): it

1. loads the named benchmark script's config and forces validation mode
   with the exact reference protocol (batch 1, unpadded original size,
   reference proxy.py:402-403);
2. converts every task-model component of the torch checkpoint
   (reference per-algorithm ckpt layouts, e.g. ssl_mt.py:296-303
   s_model/t_model) onto the flax state via models/convert.py;
3. saves the converted state as an orbax checkpoint at
   ``pretrained/<exp_id>.ckpt`` so the plain benchmark script rescoring
   works natively afterwards;
4. runs validation and prints the mIoU.
"""

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

# torch-checkpoint model keys → our state components, per algorithm
# (reference _save_checkpoint layouts: ssl_null.py:194-201,
# ssl_mt.py:296-303, ssl_adv.py:357-367, ssl_s4l.py:257-264,
# ssl_gct.py:363-376, ssl_cct.py:353-360, ssl_cutmix.py:334-342).
# Only the task models that validation scores are mapped; auxiliary nets
# (discriminator, flaw detector) keep their fresh init — they do not
# contribute to val mIoU.
COMPONENT_MAP = {
    'ssl_null': {'model': 'model'},
    'ssl_mt': {'s_model': 'model', 't_model': 'teacher'},
    'ssl_adv': {'model': 'model'},
    'ssl_s4l': {'model': 'model'},
    'ssl_cct': {'model': 'model'},
    'ssl_cutmix': {'s_model': 'model', 't_model': 'teacher'},
    'ssl_gct': {'l_model': 'l_model', 'r_model': 'r_model'},
}


def _strip_module(sub):
    return {(k[len('module.'):] if k.startswith('module.') else k): v
            for k, v in sub.items()}


def rescore(script_name, torch_ckpt, voc_root=None, save=True, mesh=None,
            overrides=None):
    import numpy as np
    import torch

    # accept both `deeplabv2_..._suponly` and `scripts/deeplabv2_..._suponly.py`
    script_name = os.path.basename(script_name)
    script_name = script_name[:-3] if script_name.endswith('.py') else script_name
    mod = importlib.import_module(script_name)
    config = dict(mod.config)

    algo_name = config['ssl_algorithm']
    if algo_name not in COMPONENT_MAP:
        raise SystemExit('Unknown algorithm: {0}'.format(algo_name))
    if voc_root:
        config['trainset'] = {list(config['trainset'])[0]: [voc_root]}
        config['valset'] = {list(config['valset'])[0]: [voc_root]}
    config['validation'] = True
    config['exact_val'] = True
    config['resume'] = ''  # weights come from the converted torch ckpt
    config.update(overrides or {})

    from pixelssl_tpu import parallel, runner
    from pixelssl_tpu.tasks import sseg
    from pixelssl_tpu.models import convert
    from pixelssl_tpu.utils import cmd

    parser = runner.create_parser(algo_name)
    sseg.add_parser_arguments(parser)
    args = cmd.parse_args(parser, config)
    cmd.print_args(args)

    proxy = sseg.SemanticSegmentationProxy(args, mesh=mesh)
    algo = proxy.ssl_algorithm

    raw = torch.load(torch_ckpt, map_location='cpu', weights_only=False)
    epoch = int(raw.get('epoch', 0))
    model_name = list(args.models.values())[0]
    converter = {'deeplabv2': convert.convert_deeplab_v2,
                 'pspnet': convert.convert_pspnet}[model_name]

    state = dict(algo.state)
    import jax
    for ckpt_key, comp in COMPONENT_MAP[algo_name].items():
        if ckpt_key not in raw:
            print('WARNING: checkpoint has no `{0}` — `{1}` keeps its '
                  'fresh init'.format(ckpt_key, comp))
            continue
        sub = {k: (v.detach().cpu().numpy() if hasattr(v, 'detach') else
                   np.asarray(v))
               for k, v in _strip_module(raw[ckpt_key]).items()}
        variables = {'params': jax.device_get(state[comp]['params']),
                     'batch_stats': jax.device_get(
                         state[comp].get('batch_stats', {}))}
        converted = converter(sub, variables)
        new_comp = dict(state[comp])
        new_comp['params'] = converted['params']
        if 'batch_stats' in new_comp:
            new_comp['batch_stats'] = converted['batch_stats']
        state[comp] = parallel.replicate(new_comp, proxy.mesh)
        print('converted `{0}` -> `{1}`'.format(ckpt_key, comp))
    algo.state = state

    if save:
        out = os.path.join('pretrained', '{0}.ckpt'.format(args.exp_id))
        os.makedirs('pretrained', exist_ok=True)
        algo.save_checkpoint(epoch, path=out)

    algo.validate(proxy.val_loader, epoch)
    return {k: float(m.avg) for k, m in algo.meters.items() if 'mIoU' in k}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('script', help='benchmark script name, e.g. '
                                   'deeplabv2_pascalvoc_1-8_suponly')
    ap.add_argument('--torch-ckpt', required=True,
                    help='published reference checkpoint (.ckpt, torch)')
    ap.add_argument('--voc-root', default=None,
                    help='override the VOC2012 root directory')
    ap.add_argument('--no-save', action='store_true',
                    help='skip writing pretrained/<exp_id>.ckpt')
    opts = ap.parse_args()
    results = rescore(opts.script, opts.torch_ckpt, voc_root=opts.voc_root,
                      save=not opts.no_save)
    for k, v in sorted(results.items()):
        print('{0} = {1:.5f}'.format(k, v))


if __name__ == '__main__':
    main()
