"""Task dataset contract (reference: pixelssl/task_template/data.py:22-98).

A task dataset is any object with:

* ``sample_list`` — list of sample names (the SSL split wrappers reorder it,
  nn/data.py);
* ``__len__`` / ``__getitem__(idx) -> (inp_tuple, gt_tuple)`` of numpy arrays
  with **fixed shapes** (static shapes are the jit contract — variable-size
  validation images are bucketed/padded by the task, not here);
* optionally ``set_num_labeled(n)`` — called by ``SplitUnlabeledWrapper`` so
  the dataset can substitute ignore-labels for unlabeled samples (the
  reference faked a ``-1`` label map, task/sseg/data.py:104-105).
"""

import zlib

import numpy as np


def add_parser_arguments(parser):
    pass


def dataset_root_key(args, is_train):
    """Stable hash of the dataset root path(s), for synthetic datasets to
    fold into their sample RNG so two datasets pointed at different roots
    (e.g. a labeled trainset and a dedicated --unlabeledset) produce
    DIFFERENT samples rather than byte-identical copies."""
    roots = (getattr(args, 'trainset', None) if is_train
             else getattr(args, 'valset', None)) or {}
    flat = []
    for v in roots.values():
        flat.extend(v if isinstance(v, (list, tuple)) else [v])
    return zlib.crc32('|'.join(sorted(str(p) for p in flat)).encode('utf8'))


class TaskDataset(object):
    def __init__(self, args=None, is_train=True):
        self.args = args
        self.is_train = is_train
        self.sample_list = []
        self.idxs = []
        self.num_labeled = None  # None → fully labeled

    def set_num_labeled(self, n):
        self.num_labeled = n

    def is_unlabeled(self, idx):
        return self.num_labeled is not None and idx >= self.num_labeled

    def __len__(self):
        return len(self.sample_list)

    def __getitem__(self, idx):
        raise NotImplementedError


class ImageLoader(object):
    """PIL-based image reader (reference data.py:89-98)."""

    @staticmethod
    def load(path, mode='RGB'):
        from PIL import Image
        with Image.open(path) as im:
            return np.asarray(im.convert(mode))
