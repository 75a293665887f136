"""Pixel-regression task adapters (task_template/func.py contract;
reference hook surface: pixelssl/task_template/func.py:80-259).

This is the REGRESSION instantiation of the hook API the sseg task
implements for CLASSIFICATION — every encoding that sseg expresses as a
one-hot collapses to the identity on the dense float map:

* ADV: the discriminator sees the [N,H,W,1] alpha map directly (pred or
  GT), no one-hot;
* GCT: the flaw-detector GT pipeline compares sigmoid predictions against
  the raw float GT;
* S4L: the rotation head reads the model's bottleneck features.

Metrics accumulate (Σsq_err, Σabs_err, #valid_pixels) in one array meter
and publish exact whole-val-set MSE / MAE / PSNR — the reset+update
pattern sseg uses for its confusion matrix (tasks/sseg/func.py:47-67).
Pixels with GT == ignore_index (validation padding) are excluded.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...task_template import func_template
from ...utils import logger


def add_parser_arguments(parser):
    func_template.add_parser_arguments(parser)


def task_func():
    return PixelRegressionFunc


@functools.partial(jax.jit, static_argnums=(2,))
def _err_sums_on_device(activated_pred, gt, ignore_index):
    pred = activated_pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    valid = (gt != ignore_index).astype(jnp.float32)
    diff = (pred - gt) * valid
    return jnp.stack([jnp.sum(jnp.square(diff)),
                      jnp.sum(jnp.abs(diff)),
                      jnp.sum(valid)])


class PixelRegressionFunc(func_template.TaskFunc):

    # ------------------------------------------------------------------

    def metrics(self, pred, gt, inp, meters, id_str=''):
        assert len(pred) == len(gt) == 1
        sums = np.asarray(jax.device_get(_err_sums_on_device(
            pred[0], gt[0], float(self.args.ignore_index))))

        sums_key = '{0}_err_sums'.format(id_str)
        meters.update(sums_key, sums)
        sq, ab, count = (float(v) for v in meters[sums_key].sum)
        count = max(count, 1.0)
        mse = sq / count
        scores = {
            'mse': mse,
            'mae': ab / count,
            # alpha range is [0,1] → MAX_I = 1
            'psnr': 10.0 * np.log10(1.0 / max(mse, 1e-12)),
        }
        for name, value in scores.items():
            key = '{0}_{1}_{2}'.format(id_str, self.METRIC_STR, name)
            if key in meters:
                meters.reset(key)
            meters.update(key, value)

    def visualize(self, out_path, id_str='', inp=None, pred=None, gt=None):
        """Input RGB + grayscale pred/GT PNGs (single sample or batch of 1)."""
        from PIL import Image

        def _unbatch(x):
            x = np.asarray(jax.device_get(x))
            return x[0] if x.ndim == 4 else x

        def _gray(x):
            x = np.clip(_unbatch(x)[..., 0], 0.0, 1.0)
            return Image.fromarray((x * 255).astype('uint8'))

        if inp is not None:
            im = np.clip(_unbatch(inp[0]), 0.0, 1.0)
            Image.fromarray((im * 255).astype('uint8')).save(
                out_path + '_{0}1-inp.png'.format(id_str))
        if pred is not None:
            _gray(pred[0]).save(out_path + '_{0}2-pred.png'.format(id_str))
        if gt is not None:
            _gray(gt[0]).save(out_path + '_{0}3-gt.png'.format(id_str))

    # ------------------------------------------------------------------
    # SSL_ADV hooks — identity encodings for a dense float map
    # ------------------------------------------------------------------

    def ssladv_fcd_in_channels(self):
        return 1

    def ssladv_preprocess_fcd_criterion(self, fcd_pred, task_gt, is_real):
        """No ignore regions during training — plain real/fake target map."""
        biclass = 1.0 if is_real else 0.0
        fcd_gt = jnp.full(fcd_pred.shape, biclass, fcd_pred.dtype)
        return fcd_pred, fcd_gt

    def ssladv_convert_task_gt_to_fcd_input(self, task_gt):
        return jnp.asarray(task_gt, jnp.float32)

    # ------------------------------------------------------------------
    # SSL_GCT hooks
    # ------------------------------------------------------------------

    def sslgct_fd_in_channels(self):
        return 1 + 3  # pred channels + RGB input

    def sslgct_prepare_task_gt_for_fdgt(self, task_gt):
        return jnp.asarray(task_gt, jnp.float32)

    def visualize_pseudo_gt(self, pseudo_gt, out_path, id_str=''):
        from PIL import Image
        p = np.asarray(jax.device_get(pseudo_gt))
        if p.ndim == 4:
            p = p[0]
        p = np.clip(p[..., 0], 0.0, 1.0)
        Image.fromarray((p * 255).astype('uint8')).save(
            out_path + '_{0}-pseudo-gt.png'.format(id_str))

    # ------------------------------------------------------------------
    # SSL_S4L hooks
    # ------------------------------------------------------------------

    def ssls4l_rc_in_channels(self):
        return 4 * self.args.base_channels  # UNetLite bottleneck width

    # CCT hooks stay unimplemented: ssl_cct declares CLASSIFICATION only
    # (reference ssl_cct.py:88) and the proxy's task-type gate rejects the
    # pairing before any hook is reached.
