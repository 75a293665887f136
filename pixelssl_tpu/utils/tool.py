"""Small shared helpers (reference: pixelssl/utils/tool.py:4-16)."""

from . import logger


_UNSET = object()


def dict_value(d, key, err_msg=None, default=_UNSET):
    """Safe dict access: error out with context, or fall back to a default."""
    if key in d and d[key] is not None:
        return d[key]
    if default is not _UNSET:
        return default
    msg = err_msg or 'Required key `{0}` missing from dict'.format(key)
    logger.log_err(msg)
