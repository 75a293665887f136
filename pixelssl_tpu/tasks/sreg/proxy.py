"""Pixel-regression proxy — the REGRESSION counterpart of the sseg proxy
(tasks/sseg/proxy.py), proving the task template against the second task
type the framework declares (reference: pixelssl/utils/constant.py,
task_template/proxy.py).
"""

from ...task_template import proxy_template
from ...utils.constant import REGRESSION
from . import criterion, data, func, model


def add_parser_arguments(parser):
    proxy_template.add_parser_arguments(parser)
    data.add_parser_arguments(parser)
    model.add_parser_arguments(parser)
    criterion.add_parser_arguments(parser)

    parser.add_argument('--ignore-index', type=float, default=255.0,
                        help='sreg - GT fill value marking invalid pixels '
                             '(validation padding); real GT lives in [0,1]')


class PixelRegressionProxy(proxy_template.TaskProxy):
    NAME = 'sreg'
    TASK_TYPE = REGRESSION

    def __init__(self, args, mesh=None):
        super(PixelRegressionProxy, self).__init__(
            args, func, data, model, criterion, mesh=mesh)
