"""Every benchmark script's config must parse through the real arg system
(catches config/flag drift without training)."""


import collections
import os

import pytest

SCRIPTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts')
# rescore.py / quickstart_synthetic.py / sreg_synthetic_sslmt.py are CLI
# entry points (config built inside main()), not config-as-code benchmark
# scripts
SCRIPTS = sorted(f for f in os.listdir(SCRIPTS_DIR)
                 if f.endswith('.py') and not f.startswith('_')
                 and f not in ('rescore.py', 'quickstart_synthetic.py',
                               'sreg_synthetic_sslmt.py'))


def _load_config(path):
    """Execute the script module (run_script is under __main__, so importing
    is side-effect free) and return its config dict."""
    ns = {'__file__': path, '__name__': 'script_under_test'}
    exec(compile(open(path).read(), path, 'exec'), ns)
    return ns['config']


@pytest.mark.parametrize('script', SCRIPTS)
def test_script_config_parses(script, monkeypatch):
    import sys
    monkeypatch.setattr(sys, 'argv', ['prog'])
    from pixelssl_tpu import runner
    from pixelssl_tpu.tasks import sseg
    from pixelssl_tpu.utils import cmd

    cfg = _load_config(os.path.join(SCRIPTS_DIR, script))
    assert cfg['ssl_algorithm'] in runner.ssl_algorithm.SSL_ALGORITHMS

    parser = runner.create_parser(cfg['ssl_algorithm'])
    sseg.add_parser_arguments(parser)
    args = cmd.parse_args(parser, cfg)

    # core invariants every script must satisfy
    assert args.models and args.optimizers and args.lrers and args.criterions
    assert set(args.models) == set(args.criterions) == set(args.optimizers)
    assert args.batch_size > args.unlabeled_batch_size >= 0
    assert args.im_size in (321, 513)
    if cfg['ssl_algorithm'] == 'ssl_null':
        assert args.unlabeled_batch_size == 0 and args.ignore_unlabeled
    else:
        assert args.unlabeled_batch_size > 0 and not args.ignore_unlabeled
    # model/criterion names resolve in the task registries
    for name in args.models.values():
        assert hasattr(sseg.model, name)
    for name in args.criterions.values():
        assert hasattr(sseg.criterion, name)


def test_all_17_scripts_present():
    assert len(SCRIPTS) == 17


def test_cli_override_opt_out(monkeypatch):
    """Wrapper tools (ssl_gain_bench, e2e_tpu_bench) run run_script with
    cli_override=False so their OWN CLI flags don't leak into the
    framework parser, where argparse prefix-matching can silently rebind
    lookalikes (a tool's --steps would set --steps-per-dispatch) or
    hard-error on ambiguous prefixes (--out vs --out-path/--output-stride)."""
    import sys

    from pixelssl_tpu import runner
    from pixelssl_tpu.tasks import sseg
    from pixelssl_tpu.utils import cmd

    parser = runner.create_parser('ssl_null')
    sseg.add_parser_arguments(parser)
    cfg = {'lr': 0.5, 'steps_per_dispatch': 2}

    # tool-style argv: would be ambiguous / rebound if merged
    monkeypatch.setattr(sys, 'argv',
                        ['tool.py', 'run', 'ssl_null', '--out', '/x',
                         '--steps', '800', '--lr', '0.007'])
    args = cmd.parse_args(parser, cfg, cli_override=False)
    assert args.lr == 0.5
    assert args.steps_per_dispatch == 2

    # experiment-script behavior (default): real argv overrides config
    monkeypatch.setattr(sys, 'argv', ['script.py', '--lr', '0.007'])
    args2 = cmd.parse_args(parser, cfg)
    assert args2.lr == 0.007
