"""Version metadata.

TPU-native rebuild of PixelSSL (reference: pixelssl/version.py:1).
"""

__version__ = '0.2.0'

__description__ = ('A TPU-native semi-supervised learning framework for '
                   'pixel-wise vision tasks')
__license__ = 'MIT'

__updates__ = {
    '0.1.0': 'initial TPU-native framework: JAX/XLA/pallas compute path, '
             'functional SSL algorithms, mesh data parallelism',
    '0.2.0': 'multi-host pods (--distributed, --auto-resume), native C++ '
             'input pipeline, spatially-sharded training/validation, '
             'StableHLO serving export, exact-protocol rescoring, '
             'profiler wiring, batch-scaled production points '
             '(~2x round-1 throughput), --clip-grad-norm',
}
