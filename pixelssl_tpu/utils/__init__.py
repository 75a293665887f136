from .constant import REGRESSION, CLASSIFICATION
from .logger import (log_mode, log_file, log_info, log_debug, log_warn,
                     log_err, FatalError, AvgMeter, AvgMeterSet)
from .tool import dict_value, assert_tensor_close, jax_support
from . import cmd
from . import env
from . import profiler
