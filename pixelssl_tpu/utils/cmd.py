"""Dict-config → argv → argparse bridge (reference: pixelssl/utils/cmd.py:10-59).

The reference's three-stage config system is preserved: experiment scripts
define an ``OrderedDict``; ``parse_args`` serializes it to CLI-style argv and
parses with an argparse parser that every module contributed flags to via its
``add_parser_arguments``. This keeps ``--help`` working and lets any config
key be overridden from a real command line.
"""

import argparse
import sys

import yaml

from . import logger


def parse_args(parser, config=None, cli_override=True):
    """Convert a config dict into argv strings and parse (cmd.py:10-27).

    ``cli_override=True`` (the reference behavior for experiment scripts)
    appends the process's real ``sys.argv`` so any config key can be
    overridden from the command line. Wrapper TOOLS with their own CLIs
    (benchmarks, sweep drivers) must pass ``False`` — otherwise their own
    flags leak into this parser, where argparse prefix-matching can
    silently rebind lookalikes (measured: a tool's ``--steps`` would set
    ``--steps-per-dispatch``) or hard-error on ambiguous prefixes."""
    argv = []
    if config is not None:
        for key, value in config.items():
            flag = '--' + str(key).replace('_', '-')
            argv.append(flag)
            argv.append(str(value))
    if cli_override:
        # real command-line arguments override config entries
        argv += sys.argv[1:]
    args, unknown = parser.parse_known_args(argv)
    for token in unknown:
        if token.startswith('--'):
            logger.log_warn('Unknown argument: {0}'.format(token))
    return args


def print_args(args):
    logger.log_info('Arguments:')
    for key, value in sorted(vars(args).items()):
        logger.log_info('  {0:<28}: {1}'.format(key, value))


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ('yes', 'true', 't', 'y', '1'):
        return True
    if v.lower() in ('no', 'false', 'f', 'n', '0'):
        return False
    raise argparse.ArgumentTypeError('Boolean value expected, got {0}'.format(v))


def str2intlist(v):
    if isinstance(v, (list, tuple)):
        return [int(x) for x in v]
    v = v.strip().strip('[]()')
    return [int(x) for x in v.split(',') if x.strip() != '']


def str2floatlist(v):
    if isinstance(v, (list, tuple)):
        return [float(x) for x in v]
    v = v.strip().strip('[]()')
    return [float(x) for x in v.split(',') if x.strip() != '']


def strdict(v):
    """YAML-typed dict flag (reference proxy.py:42-55 uses yaml.full_load)."""
    if isinstance(v, dict):
        return v
    return yaml.full_load(v)
