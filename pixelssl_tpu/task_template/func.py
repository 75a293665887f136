"""Task function adapter surface (reference: pixelssl/task_template/func.py:20-259).

``TaskFunc`` is the per-task hook collection the SSL algorithms call so they
never see task internals. Hooks that feed the fused train steps must be pure
jnp functions (they are traced); ``metrics`` runs at validation time and may
mix on-device reductions with host post-processing.
"""

from ..utils import logger
from ..utils.constant import REGRESSION, CLASSIFICATION  # noqa: F401

METRIC_STR = 'metric'


def add_parser_arguments(parser):
    pass


class TaskFunc(object):
    METRIC_STR = METRIC_STR

    def __init__(self, args=None):
        self.args = args

    # ------------------------------------------------------------------
    # generic
    # ------------------------------------------------------------------

    def device_prep(self, batch):
        """Map a freshly-transferred batch to the dtypes/space the task
        math expects, INSIDE the jitted step (TPU build addition: the
        reference normalizes on the CPU host, data.py:99; moving it here
        lets the host ship compact wire formats like uint8 RGB + int16
        labels — see --u8-transfer). Runs under jit at the top of every
        train/eval step (ssl_algorithm/ssl_base.build), so it must be
        pure and cheap; XLA fuses it into the first consumer. Identity by
        default."""
        return batch

    def metrics(self, pred, gt, inp, meters, id_str=''):
        """Accumulate task metrics into ``meters`` (reference func.py:42-56).

        Keys containing ``METRIC_STR`` are summarized at the end of
        validation by every algorithm's _validate loop.
        """
        raise NotImplementedError

    def visualize(self, out_path, id_str='', inp=None, pred=None, gt=None):
        """Dump visualization images (reference func.py:58-77)."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    # hooks for ssl_adv (reference func.py:80-145)
    # ------------------------------------------------------------------

    def ssladv_fcd_in_channels(self):
        """Input channels of the FC discriminator."""
        logger.log_err('Task does not implement ssladv_fcd_in_channels — '
                       'required by the ssl_adv algorithm')

    def ssladv_preprocess_fcd_criterion(self, fcd_pred, task_gt, is_real):
        """Build (pred, gt, mask) for the discriminator BCE given real/fake."""
        logger.log_err('Task does not implement ssladv_preprocess_fcd_criterion')

    def ssladv_convert_task_gt_to_fcd_input(self, task_gt):
        """One-hot (or equivalent) GT encoding fed to the discriminator as
        the 'real' sample. Pure jnp (the reference did this on host numpy —
        task/sseg/func.py:158-168; here it stays on device)."""
        logger.log_err('Task does not implement ssladv_convert_task_gt_to_fcd_input')

    # ------------------------------------------------------------------
    # hooks for ssl_gct (reference func.py:148-183)
    # ------------------------------------------------------------------

    def sslgct_fd_in_channels(self):
        """Input channels of the flaw detector (task inp ch + pred ch)."""
        logger.log_err('Task does not implement sslgct_fd_in_channels')

    def sslgct_prepare_task_gt_for_fdgt(self, task_gt):
        """Encode GT for the flaw-detector GT generator (one-hot w/ boundary
        ignore for sseg, reference task/sseg/func.py:176-192)."""
        logger.log_err('Task does not implement sslgct_prepare_task_gt_for_fdgt')

    # ------------------------------------------------------------------
    # hooks for ssl_s4l (reference func.py:186-202)
    # ------------------------------------------------------------------

    def ssls4l_rc_in_channels(self):
        """Input channels of the rotation classifier."""
        logger.log_err('Task does not implement ssls4l_rc_in_channels')

    # ------------------------------------------------------------------
    # hooks for ssl_cct (reference func.py:205-259)
    # ------------------------------------------------------------------

    def sslcct_activate_ad_preds(self, ad_preds):
        """Activate aux-decoder predictions (softmax for sseg)."""
        logger.log_err('Task does not implement sslcct_activate_ad_preds')

    def sslcct_ad_in_channels(self):
        logger.log_err('Task does not implement sslcct_ad_in_channels')

    def sslcct_ad_out_channels(self):
        logger.log_err('Task does not implement sslcct_ad_out_channels')

    def sslcct_ad_upsample_scale(self):
        logger.log_err('Task does not implement sslcct_ad_upsample_scale')
