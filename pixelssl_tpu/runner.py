"""Script entry point (reference: pixelssl/runner.py:12-41).

``run_script(config, proxy_module, proxy_class)`` builds an argparse parser
from every layer's ``add_parser_arguments``, serializes the config dict to
argv, parses, instantiates the task proxy and runs it.
"""

import argparse
import sys

from . import ssl_algorithm
from .nn import lrer, optimizer
from .utils import cmd, logger


def create_parser(ssl_algorithm_name):
    parser = argparse.ArgumentParser(description='PixelSSL-TPU experiment')
    optimizer.add_parser_arguments(parser)
    lrer.add_parser_arguments(parser)
    ssl_algorithm.get_module(ssl_algorithm_name).add_parser_arguments(parser)
    return parser


def run_script(config, proxy_module, proxy_class, mesh=None,
               cli_override=True):
    """``cli_override``: experiment scripts keep the reference behavior
    (real argv overrides config keys); wrapper tools with their own CLIs
    pass ``False`` so their flags don't leak into this parser
    (utils/cmd.parse_args)."""
    if cli_override and ('--help' in sys.argv or '-h' in sys.argv):
        parser = create_parser(config.get('ssl_algorithm', 'ssl_null'))
        proxy_module.add_parser_arguments(parser)
        parser.parse_args()
        return

    algo = config.get('ssl_algorithm')
    if not algo:
        logger.log_err('Config must define `ssl_algorithm`')

    parser = create_parser(algo)
    proxy_module.add_parser_arguments(parser)
    args = cmd.parse_args(parser, config, cli_override=cli_override)
    cmd.print_args(args)

    task_proxy = proxy_class(args, mesh=mesh) if mesh is not None else proxy_class(args)
    task_proxy.run()
    return task_proxy
