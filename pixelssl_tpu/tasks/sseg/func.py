"""Semantic-segmentation task adapters (reference: task/sseg/func.py:23-345).

TPU-first notes:

* ``metrics`` builds the confusion matrix ON DEVICE (ops/confusion.py, one
  bincount kernel) — the reference copied the full logit map to host numpy
  per validation sample (func.py:39-47); here only the C×C matrix crosses.
* The ADV/GCT hooks that the reference ran on host numpy (one-hot with
  ignore handling, func.py:158-196) are pure jnp and trace into the fused
  train steps.
* All dense maps are NHWC.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...nn.module import gaussian_blur
from ...ops import confusion_matrix, scores_from_confusion
from ...task_template import func_template
from ...utils import logger
from . import data


def add_parser_arguments(parser):
    func_template.add_parser_arguments(parser)


def task_func():
    return SemanticSegmentationFunc


@functools.partial(jax.jit, static_argnums=(2, 3))
def _cm_on_device(activated_pred, gt, num_classes, ignore_index):
    pred_label = jnp.argmax(activated_pred, axis=-1)
    return confusion_matrix(pred_label, gt, num_classes, ignore_index)


class SemanticSegmentationFunc(func_template.TaskFunc):
    def __init__(self, args):
        super(SemanticSegmentationFunc, self).__init__(args)
        self._colorize = VOCColorize(args.num_classes + 1)

    # ------------------------------------------------------------------

    def device_prep(self, batch):
        """u8 wire mode (--u8-transfer): normalize uint8 RGB on device
        with the same VOC mean/std the host path uses (data.py
        normalize_image) and widen int16 labels to int32. Identity for
        float32 batches, so algorithms never see mixed conventions."""
        inp, gt = batch['inp'], batch['gt']
        x = inp[0]
        if x.dtype == jnp.uint8:
            mean = jnp.asarray(data.VOC_MEAN, jnp.float32)
            std = jnp.asarray(data.VOC_STD, jnp.float32)
            x = (x.astype(jnp.float32) / 255.0 - mean) / std
            inp = (x,) + tuple(inp[1:])
        g = gt[0]
        if g.dtype in (jnp.int16, jnp.int8, jnp.uint8):
            gt = (g.astype(jnp.int32),) + tuple(gt[1:])
        if inp is batch['inp'] and gt is batch['gt']:
            return batch
        return dict(batch, inp=inp, gt=gt)

    def metrics(self, pred, gt, inp, meters, id_str=''):
        """Accumulate the confusion matrix; metric meters always hold the
        overall score so far (reference func.py:36-80 reset+update pattern)."""
        assert len(pred) == len(gt) == 1
        gt0 = gt[0]
        if hasattr(gt0, 'ndim') and gt0.ndim == 4:
            gt0 = gt0[..., 0]
        cm = np.asarray(jax.device_get(
            _cm_on_device(pred[0], gt0, self.args.num_classes,
                          self.args.ignore_index)))

        cm_key = '{0}_confusion_matrix'.format(id_str)
        meters.update(cm_key, cm)
        cm_sum = meters[cm_key].sum
        scores = scores_from_confusion(cm_sum)

        for name in ('acc', 'acc_class', 'mIoU', 'fwIoU'):
            key = '{0}_{1}_{2}'.format(id_str, self.METRIC_STR, name)
            if key in meters:
                meters.reset(key)
            meters.update(key, scores[name])

    def visualize(self, out_path, id_str='', inp=None, pred=None, gt=None):
        """Save input/pred/gt PNGs (reference func.py:82-131). Arrays NHWC;
        expects single samples (no batch dim) or batch dim of 1."""
        from PIL import Image

        def _unbatch(x):
            x = np.asarray(jax.device_get(x))
            return x[0] if x.ndim == 4 else x

        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])

        if inp is not None:
            im = _unbatch(inp[0])
            if im.dtype == np.uint8:   # --u8-transfer: raw RGB wire format
                im = im / 255.0
            else:
                im = im * std + mean
            im = np.clip(im, 0, 1)
            Image.fromarray((im * 255).astype('uint8')).save(
                out_path + '_{0}1-inp.png'.format(id_str))
        if pred is not None:
            p = _unbatch(pred[0])
            p = np.argmax(p, axis=-1)
            Image.fromarray(self._colorize(p)).save(
                out_path + '_{0}2-pred.png'.format(id_str))
        if gt is not None:
            g = _unbatch(gt[0])
            if g.ndim == 3:
                g = g[..., 0]
            Image.fromarray(self._colorize(g)).save(
                out_path + '_{0}3-gt.png'.format(id_str))

    # ------------------------------------------------------------------
    # SSL_ADV hooks (reference func.py:134-168) — pure jnp, on-device
    # ------------------------------------------------------------------

    def ssladv_fcd_in_channels(self):
        return self.args.num_classes

    def ssladv_preprocess_fcd_criterion(self, fcd_pred, task_gt, is_real):
        """Returns (masked_pred, masked_gt) for the per-pixel BCE.

        fcd_pred: [N,H,W,1] logits. task_gt: [N,H,W] labels or None.
        Ignore-region pixels are zeroed on both sides (reference
        func.py:139-156).
        """
        biclass = 1.0 if is_real else 0.0
        if task_gt is None:
            mask = jnp.ones(fcd_pred.shape, fcd_pred.dtype)
        else:
            ig = (task_gt == self.args.ignore_index)
            mask = 1.0 - ig[..., None].astype(fcd_pred.dtype)
        fcd_gt = jnp.full(fcd_pred.shape, biclass, fcd_pred.dtype) * mask
        return fcd_pred * mask, fcd_gt

    def ssladv_convert_task_gt_to_fcd_input(self, task_gt):
        """One-hot GT [N,H,W,C] (reference func.py:158-168 did this on host;
        ignore pixels become all-zero rows via the out-of-range trick)."""
        return jax.nn.one_hot(task_gt, self.args.num_classes, dtype=jnp.float32)

    # ------------------------------------------------------------------
    # SSL_GCT hooks (reference func.py:176-196)
    # ------------------------------------------------------------------

    def sslgct_fd_in_channels(self):
        return self.args.num_classes + 3

    def sslgct_prepare_task_gt_for_fdgt(self, task_gt):
        """One-hot with boundary ignore: rows at ignore_index are all-zero
        (reference func.py:181-192)."""
        one_hot = jax.nn.one_hot(task_gt, self.args.num_classes,
                                 dtype=jnp.float32)
        keep = (task_gt != self.args.ignore_index)[..., None]
        return one_hot * keep.astype(jnp.float32)

    def visualize_pseudo_gt(self, pseudo_gt, out_path, id_str=''):
        """Colorized argmax dump of a GCT dynamic-consistency pseudo-GT
        (reference func.py:196-202)."""
        from PIL import Image
        p = np.asarray(jax.device_get(pseudo_gt))
        if p.ndim == 4:
            p = p[0]
        p = np.argmax(p, axis=-1)
        Image.fromarray(self._colorize(p)).save(
            out_path + '_{0}-pseudo-gt.png'.format(id_str))

    # ------------------------------------------------------------------
    # SSL_S4L hooks (reference func.py:205-207)
    # ------------------------------------------------------------------

    def ssls4l_rc_in_channels(self):
        return self.args.num_classes

    # ------------------------------------------------------------------
    # SSL_CCT hooks (reference func.py:216-253)
    # ------------------------------------------------------------------

    def sslcct_activate_ad_preds(self, ad_preds):
        return [jax.nn.softmax(p, axis=-1) for p in ad_preds]

    def sslcct_ad_in_channels(self):
        arch = self.args.models['model']
        if arch == 'pspnet':
            return 512
        if arch == 'deeplabv2':
            return 2048
        logger.log_err('sslcct_ad_in_channels does not support model '
                       '`{0}`'.format(arch))

    def sslcct_ad_out_channels(self):
        return self.args.num_classes

    def sslcct_ad_upsample_scale(self):
        arch = self.args.models['model']
        if arch in ('pspnet', 'deeplabv2'):
            return 8
        logger.log_err('sslcct_ad_upsample_scale does not support model '
                       '`{0}`'.format(arch))


def fdgt_generator(pred, gt, num_classes, ignore_index, im_size):
    """Task-local flaw-detector GT pipeline — mirrors the reference's
    task/sseg/func.py:258-297 FDGTGenerator, which INTENTIONALLY differs
    from ssl_gct.py's (μ,ν) variant: sum/2 instead of ·μ, and exactly one
    dilate+reblur instead of ν repeats. Like the reference's copy it is not
    called by any algorithm (ssl_gct uses its own pipeline); kept for
    API parity. Pure jnp."""
    one_hot = jax.nn.one_hot(gt, num_classes, dtype=jnp.float32)
    one_hot = one_hot * (gt != ignore_index)[..., None].astype(jnp.float32)
    diff = jnp.sum(jnp.abs(one_hot - jax.lax.stop_gradient(pred)),
                   axis=-1, keepdims=True) / 2.0

    k1 = _odd(int(im_size / 8))
    k2 = _odd(int(im_size / 4))
    diff = gaussian_blur(diff, k1)
    diff = _dilate3x3(diff)
    diff = gaussian_blur(diff, k2)

    dmax = jnp.max(diff, axis=(1, 2, 3), keepdims=True)
    dmin = jnp.min(diff, axis=(1, 2, 3), keepdims=True)
    return (diff - dmin) / (dmax - dmin + 1e-9)


def _odd(k):
    return k + 1 if k % 2 == 0 else k


def _dilate3x3(x):
    """ReflectionPad(1) + 3×3 max-pool stride 1 (reference func.py:283-286)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
    return jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 1, 1, 1), 'VALID')


# ---------------------------------------------------------------------------
# VOC colormap (reference func.py:306-345)
# ---------------------------------------------------------------------------

def color_map(N=256, normalized=False):
    def bitget(byteval, idx):
        return (byteval & (1 << idx)) != 0

    dtype = 'float32' if normalized else 'uint8'
    cmap = np.zeros((N, 3), dtype=dtype)
    for i in range(N):
        r = g = b = 0
        c = i
        for j in range(8):
            r = r | (bitget(c, 0) << (7 - j))
            g = g | (bitget(c, 1) << (7 - j))
            b = b | (bitget(c, 2) << (7 - j))
            c = c >> 3
        cmap[i] = np.array([r, g, b])
    return cmap / 255 if normalized else cmap


class VOCColorize(object):
    def __init__(self, n=22):
        self.cmap = color_map(256)[:n]

    def __call__(self, gray_image):
        """int [H,W] → uint8 [H,W,3]; 255 (void) renders white."""
        gray = np.asarray(gray_image).astype(np.int32)
        out = np.zeros(gray.shape + (3,), dtype=np.uint8)
        for label in range(len(self.cmap)):
            out[gray == label] = self.cmap[label]
        out[gray == 255] = 255
        return out
