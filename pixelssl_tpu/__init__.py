"""PixelSSL-TPU: a TPU-native semi-supervised pixel-wise vision toolbox.

Ground-up JAX/XLA/pallas rebuild of the capabilities of PixelSSL
(reference mounted at /root/reference). Public surface mirrors the
reference package root (reference: pixelssl/__init__.py:3-11).
"""

from .version import __version__, __description__, __license__, __updates__

from .utils import (REGRESSION, CLASSIFICATION, log_mode, log_file, log_info,
                    log_warn, log_err, FatalError, AvgMeter, AvgMeterSet,
                    dict_value)
from .utils.cmd import str2bool, str2intlist, str2floatlist

from . import utils
from . import nn
from . import ops
from . import parallel
from . import models
from . import task_template
from .task_template import (proxy_template, func_template, data_template,
                            model_template, criterion_template)
from . import ssl_algorithm
from .ssl_algorithm import (SSL_ALGORITHMS, SSL_NULL, SSL_MT, SSL_ADV,
                            SSL_S4L, SSL_GCT, SSL_CCT, SSL_CUTMIX)
from .runner import run_script, create_parser
