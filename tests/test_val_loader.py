"""_ValLoader: mesh-sized batches, ignore-padded tails, bucketed shapes,
spatial sharding mode."""

import numpy as np

from pixelssl_tpu import parallel
from pixelssl_tpu.task_template.proxy import _ValLoader


class _VarSizeDataset(object):
    """Val-style dataset with variable image sizes."""

    def __init__(self, sizes):
        self.sizes = sizes

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        h, w = self.sizes[i]
        img = np.full((h, w, 3), float(i), np.float32)
        gt = np.full((h, w), i % 4, np.int32)
        return (img,), (gt,)


def test_val_loader_pads_and_buckets():
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    ds = _VarSizeDataset([(40, 50)] * (n + 1))  # one spill batch
    loader = _ValLoader(ds, n, mesh, ignore_index=255)
    batches = list(loader)
    assert len(batches) == 2
    b0, b1 = batches
    # spatial dims bucketed up to multiples of 32
    assert np.asarray(b0['inp'][0]).shape == (n, 64, 64, 3)
    # padding labels are ignore_index
    gt0 = np.asarray(b0['gt'][0])
    assert gt0[0, 45, 0] == 255 and gt0[0, 0, 0] == 0
    # tail batch: one real + n-1 dummy samples, masked by 'valid'
    valid = np.asarray(b1['valid'])
    assert valid.sum() == 1.0 and valid[0] == 1.0
    # dummy samples carry all-ignore GT → contribute nothing to metrics
    assert np.all(np.asarray(b1['gt'][0])[1:] == 255)


def test_val_loader_spatial_mode():
    mesh = parallel.make_mesh()
    n = mesh.devices.size
    ds = _VarSizeDataset([(40, 50), (44, 50)])
    loader = _ValLoader(ds, 1, mesh, ignore_index=255, spatial=True)
    batches = list(loader)
    assert len(batches) == 2
    img = batches[0]['inp'][0]
    # H padded to a multiple of both the bucket and the mesh size
    assert img.shape[1] % n == 0
    # sharded over H: each device holds a contiguous H slice
    sharding = img.sharding
    assert sharding.spec[1] == parallel.DATA_AXIS
