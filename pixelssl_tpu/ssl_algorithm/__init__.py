"""SSL algorithm registry (reference: pixelssl/ssl_algorithm/__init__.py:19-27)."""

from . import ssl_base
from . import ssl_null

SSL_NULL = ssl_null.SSLNULL.NAME

_MODULES = {SSL_NULL: ssl_null}


def _register():
    """Late imports so partially-built algorithms don't break the package."""
    global _MODULES
    try:
        from . import ssl_mt
        _MODULES[ssl_mt.SSLMT.NAME] = ssl_mt
    except ImportError:
        pass
    try:
        from . import ssl_adv
        _MODULES[ssl_adv.SSLADV.NAME] = ssl_adv
    except ImportError:
        pass
    try:
        from . import ssl_s4l
        _MODULES[ssl_s4l.SSLS4L.NAME] = ssl_s4l
    except ImportError:
        pass
    try:
        from . import ssl_gct
        _MODULES[ssl_gct.SSLGCT.NAME] = ssl_gct
    except ImportError:
        pass
    try:
        from . import ssl_cct
        _MODULES[ssl_cct.SSLCCT.NAME] = ssl_cct
    except ImportError:
        pass
    try:
        from . import ssl_cutmix
        _MODULES[ssl_cutmix.SSLCUTMIX.NAME] = ssl_cutmix
    except ImportError:
        pass


_register()

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
