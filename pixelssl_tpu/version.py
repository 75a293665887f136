"""Version metadata.

TPU-native rebuild of PixelSSL (reference: pixelssl/version.py:1).
"""

__version__ = '0.1.0'

__updates__ = {
    '0.1.0': 'initial TPU-native framework: JAX/XLA/pallas compute path, '
             'functional SSL algorithms, mesh data parallelism',
}
