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


def assert_tensor_close(a, b, atol=1e-3, rtol=1e-3):
    """Numeric comparison helper (counterpart of the reference's vendored
    sync_batchnorm/unittest.py:23-29 TorchTestCase.assertTensorClose)."""
    import numpy as np
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


def jax_support(min_version='0.4.30', info_str='pixelssl_tpu'):
    """Runtime version guard (counterpart of reference nn/func.py:85
    pytorch_support)."""
    import jax
    from . import logger
    have = tuple(int(x) for x in jax.__version__.split('.')[:3])
    want = tuple(int(x) for x in min_version.split('.')[:3])
    if have < want:
        logger.log_err('{0} requires jax >= {1}, found {2}'.format(
            info_str, min_version, jax.__version__))
    return True
