"""On-device confusion matrix + segmentation metrics.

The reference accumulates a numpy confusion matrix on the host for every
validation sample (reference: task/sseg/func.py:36-80, device→host copy per
sample). Here the matrix is built on-device with a single ``bincount`` over
``gt*C + pred`` (one fused XLA kernel, no host sync inside the loop) and only
the final C×C int array crosses to the host.
"""

import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred, gt, num_classes, ignore_index=255):
    """Confusion matrix [C, C] with rows = gt, cols = pred.

    ``pred``/``gt`` are integer class maps of identical shape. Pixels whose
    gt equals ``ignore_index`` (or is out of range) are dropped — matching
    the reference's mask ``(gt >= 0) & (gt < C)`` (task/sseg/func.py:41-44).
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes) & (gt != ignore_index)
    idx = jnp.where(valid, gt * num_classes + jnp.clip(pred, 0, num_classes - 1),
                    num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def scores_from_confusion(cm):
    """acc / acc_class / mIoU / fwIoU from a summed confusion matrix
    (reference task/sseg/func.py:45-80). Host-side numpy on the tiny C×C."""
    cm = np.asarray(cm, dtype=np.float64)
    eps = 1e-12
    total = cm.sum()
    acc = np.diag(cm).sum() / (total + eps)
    with np.errstate(divide='ignore', invalid='ignore'):
        acc_cls = np.diag(cm) / cm.sum(axis=1)
        iou = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
    acc_cls_mean = np.nanmean(acc_cls)
    miou = np.nanmean(iou)
    freq = cm.sum(axis=1) / (total + eps)
    fwiou = (freq[freq > 0] * iou[freq > 0]).sum()
    return {
        'acc': float(acc),
        'acc_class': float(acc_cls_mean),
        'mIoU': float(miou),
        'fwIoU': float(fwiou),
    }
