from . import func
from . import optimizer
from . import lrer
from . import data
from . import loader
from . import module
