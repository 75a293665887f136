"""SSL algorithm registry (reference: pixelssl/ssl_algorithm/__init__.py:19-27).

Imports are unconditional: a broken transitive import inside an algorithm
module must surface as the real ImportError at package import time, not as
a misleading "Unknown SSL algorithm" later.
"""

from . import ssl_base  # noqa: F401
from . import ssl_null
from . import ssl_mt
from . import ssl_adv
from . import ssl_s4l
from . import ssl_gct
from . import ssl_cct
from . import ssl_cutmix

# algorithm-name constants, mirroring the reference's public API
# (reference ssl_algorithm/__init__.py:10-16; scripts there say
# `pixelssl.SSL_MT` instead of 'ssl_mt')
SSL_NULL = ssl_null.SSLNULL.NAME
SSL_MT = ssl_mt.SSLMT.NAME
SSL_ADV = ssl_adv.SSLADV.NAME
SSL_S4L = ssl_s4l.SSLS4L.NAME
SSL_GCT = ssl_gct.SSLGCT.NAME
SSL_CCT = ssl_cct.SSLCCT.NAME
SSL_CUTMIX = ssl_cutmix.SSLCUTMIX.NAME

_MODULES = {
    ssl_null.SSLNULL.NAME: ssl_null,
    ssl_mt.SSLMT.NAME: ssl_mt,
    ssl_adv.SSLADV.NAME: ssl_adv,
    ssl_s4l.SSLS4L.NAME: ssl_s4l,
    ssl_gct.SSLGCT.NAME: ssl_gct,
    ssl_cct.SSLCCT.NAME: ssl_cct,
    ssl_cutmix.SSLCUTMIX.NAME: ssl_cutmix,
}

SSL_ALGORITHMS = sorted(_MODULES.keys())


def get_module(name):
    if name not in _MODULES:
        from ..utils import logger
        logger.log_err('Unknown SSL algorithm `{0}`. Valid: {1}'.format(
            name, SSL_ALGORITHMS))
    return _MODULES[name]


def get_builder(name):
    """The export function, e.g. ssl_null.ssl_null."""
    return getattr(get_module(name), name)
