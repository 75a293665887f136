"""PASCAL VOC (SBD-augmented) data pipeline + synthetic dataset
(reference: task/sseg/data.py:18-294).

Transform semantics preserved: train = RandomScaleCrop(short edge scaled to
U[0.5,2]·base_size, zero-pad, random crop im_size) + HFlip + ImageNet
Normalize (data.py:223-256,187,99); val = optional FixedScaleResize short-edge
rescale gated by --val-rescaling (data.py:259-294). Unlabeled train samples
get a fake ``-1`` label map (data.py:104-105).

TPU-first differences: outputs are NHWC numpy (image float32 [H,W,3], label
int32 [H,W]); augmentation randomness is drawn from a seeded
``np.random.Generator`` per access rather than the global ``random`` module.
"""

import os
import threading

import numpy as np
from PIL import Image, ImageOps

from ...utils import cmd
from ...task_template import data_template
from ...utils import logger

VOC_MEAN = (0.485, 0.456, 0.406)
VOC_STD = (0.229, 0.224, 0.225)


def add_parser_arguments(parser):
    data_template.add_parser_arguments(parser)
    parser.add_argument('--val-rescaling', type=cmd.str2bool,
                        default=False,
                        help='sseg - rescale the short edge of val images to im_size')
    parser.add_argument('--train-base-size', type=int, default=400,
                        help='sseg - base size for random scale-crop during training')
    parser.add_argument('--synthetic-samples', type=int, default=64,
                        help='sseg - sample count of the synthetic dataset')
    parser.add_argument('--native-augment',
                        type=cmd.str2bool,
                        default=False,
                        help='sseg - use the fused C++ augmentation library '
                             '(faster; point-sampled bilinear instead of '
                             "PIL's antialiased resize)")
    parser.add_argument('--decoded-cache',
                        type=cmd.str2bool,
                        default=False,
                        help='sseg - cache decoded images in RAM so each '
                             'training access skips JPEG/PNG decode (random '
                             'augmentation still runs per access). Costs '
                             '~H*W*7 bytes per train image; pairs with '
                             '--native-augment to feed few-core hosts')
    parser.add_argument('--u8-transfer',
                        type=cmd.str2bool,
                        default=False,
                        help='sseg - emit train batches as raw uint8 RGB + '
                             'uint8 labels (4x fewer host->device bytes; '
                             'pixels quantized to 1/255; labels widen to '
                             'int16 if num_classes > 254 or ignore_index '
                             '!= 255) and normalize on device via the task '
                             'device_prep hook')


def pascal_voc_aug():
    return PascalVocAugDataset


def pascal_voc_ori():
    return PascalVocOriDataset


def synthetic_sseg():
    return SyntheticSsegDataset


# ---------------------------------------------------------------------------
# transforms (numpy/PIL, seeded)
# ---------------------------------------------------------------------------

def normalize_image(img):
    img = np.asarray(img, dtype=np.float32) / 255.0
    img = (img - np.asarray(VOC_MEAN, np.float32)) / np.asarray(VOC_STD, np.float32)
    return img


def random_scale_crop(rng, img, mask, base_size, crop_size, fill=0):
    """Reference data.py:223-256 (mask padding fill=0, as upstream)."""
    short_size = int(rng.integers(int(base_size * 0.5), int(base_size * 2.0) + 1))
    w, h = img.size
    if h > w:
        ow = short_size
        oh = int(1.0 * h * ow / w)
    else:
        oh = short_size
        ow = int(1.0 * w * oh / h)
    img = img.resize((ow, oh), Image.BILINEAR)
    mask = mask.resize((ow, oh), Image.NEAREST)
    if short_size < crop_size:
        padh = crop_size - oh if oh < crop_size else 0
        padw = crop_size - ow if ow < crop_size else 0
        img = ImageOps.expand(img, border=(0, 0, padw, padh), fill=0)
        mask = ImageOps.expand(mask, border=(0, 0, padw, padh), fill=fill)
    w, h = img.size
    x1 = int(rng.integers(0, w - crop_size + 1))
    y1 = int(rng.integers(0, h - crop_size + 1))
    img = img.crop((x1, y1, x1 + crop_size, y1 + crop_size))
    mask = mask.crop((x1, y1, x1 + crop_size, y1 + crop_size))
    return img, mask


def fixed_scale_resize(img, mask, size):
    """Reference data.py:259-294: short edge → size, zero-pad to ≥size."""
    w, h = img.size
    if w <= h:
        ow = size
        oh = int(h * ow / w)
    else:
        oh = size
        ow = int(w * oh / h)
    img = img.resize((ow, oh), Image.BILINEAR)
    mask = mask.resize((ow, oh), Image.NEAREST)
    pad_w, pad_h = max(size - ow, 0), max(size - oh, 0)
    if pad_w or pad_h:
        img = ImageOps.expand(img, border=(0, 0, pad_w, pad_h), fill=0)
        mask = ImageOps.expand(mask, border=(0, 0, pad_w, pad_h), fill=0)
    return img, mask


# ---------------------------------------------------------------------------
# PASCAL VOC
# ---------------------------------------------------------------------------

class PascalVocDataset(data_template.TaskDataset):
    def __init__(self, args, is_train, train_prefix_path, val_prefix_path):
        super(PascalVocDataset, self).__init__(args, is_train)
        self.im_size = args.im_size
        self.root_dir = (list(args.trainset.values())[0] if is_train
                         else list(args.valset.values())[0])
        if isinstance(self.root_dir, (list, tuple)):
            self.root_dir = self.root_dir[0]

        prefix_path = os.path.join(
            self.root_dir, train_prefix_path if is_train else val_prefix_path)
        self.image_dir = os.path.join(self.root_dir, 'JPEGImages')
        self.label_dir = os.path.join(self.root_dir, 'SegmentationClassAug')

        if not os.path.exists(prefix_path):
            logger.log_err('Cannot find prefix file: {0}'.format(prefix_path))
        with open(prefix_path) as f:
            lines = [l.strip() for l in f.read().splitlines() if l.strip()]
        for line in lines:
            if not os.path.isfile(os.path.join(self.image_dir, line + '.jpg')):
                logger.log_err('Cannot find image: {0}.jpg'.format(line))
            self.sample_list.append(line)
        self.idxs = list(range(len(self.sample_list)))

        self._seed = getattr(args, 'seed', 0) or 0
        # per-index access counters: the k-th access of sample idx always
        # draws from rng (seed, idx, k), regardless of loader-thread
        # interleaving — keeps augmentation streams reproducible with
        # num_workers > 0 (a global counter would depend on scheduling)
        self._access_lock = threading.Lock()
        self._access_counts = {}
        self._use_native = False
        self._dims_cache = {}
        # decoded-image RAM cache (--decoded-cache): idx -> (uint8 [h,w,3]
        # image, int32 [h,w] label or None). The 1-core TPU host decodes
        # ~half its augment budget away (tools/loader_bench.py); caching
        # the decode keeps augmentation randomness fully intact while
        # roughly doubling loader throughput. Train-time only.
        self._decoded_cache = ({} if is_train and
                               getattr(args, 'decoded_cache', False)
                               else None)
        # u8 wire mode: train samples leave the host as uint8 RGB + narrow
        # labels; tasks/sseg/func.device_prep normalizes inside the jitted
        # step. Val samples stay float32 (tiny fraction of the traffic).
        self._u8 = bool(is_train and getattr(args, 'u8_transfer', False))
        # Labels ride uint8 (not int16) when every value fits a byte:
        # classes <= 254, the VOC void byte (255) kept as-is, and the
        # unlabeled -1 sentinel (reference task/sseg/data.py:104-105)
        # wrapped to 255 by the cast. Every gt consumer treats -1 and 255
        # identically — the criterion/confusion mask is
        # (gt >= 0) & (gt < C) & (gt != ignore_index) and the one_hot
        # hooks zero out-of-range rows — so the wire encoding is lossless
        # in effect while halving label bytes (labels were 40% of the u8
        # dispatch payload; the ingest wall is byte-proportional,
        # BASELINE.md).
        self._u8_lbl = (self._u8 and
                        getattr(args, 'ignore_index', 255) == 255 and
                        getattr(args, 'num_classes', 256) <= 254)
        if getattr(args, 'native_augment', False):
            from ...nn import native
            self._use_native = native.decode_available()
            if not self._use_native:
                logger.log_warn('--native-augment set but the library is not '
                                'built (make -C pixelssl_tpu/native); '
                                'falling back to PIL')
            elif self._u8 and not native.raw_available():
                logger.log_warn('--u8-transfer: native lib lacks the raw '
                                'exports; rebuild with make -C '
                                'pixelssl_tpu/native (using PIL u8 path)')
                self._use_native = False

    def _geometry(self, rng, h, w):
        """Random scale-crop-flip parameters — the same draw order and
        distribution as random_scale_crop + the HFlip coin, so the PIL and
        native paths are stream-compatible."""
        base, crop = self.args.train_base_size, self.im_size
        short_size = int(rng.integers(int(base * 0.5), int(base * 2.0) + 1))
        if h > w:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        else:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        ph, pw = max(oh, crop), max(ow, crop)
        # x1 before y1: random_scale_crop's draw order — for non-square
        # images swapping these maps the same RNG stream to a different
        # crop, breaking PIL/native per-seed reproducibility
        x1 = int(rng.integers(0, pw - crop + 1))
        y1 = int(rng.integers(0, ph - crop + 1))
        flip = bool(rng.random() < 0.5)
        return (oh, ow), (y1, x1), flip

    def _decoded(self, idx, img_path, label_path):
        """Decode-once cache entry: (uint8 [h,w,3] image, int32 [h,w]
        label or None). Concurrent first accesses may decode twice; the
        dict insert under the lock keeps one winner."""
        ent = self._decoded_cache.get(idx)
        if ent is not None:
            return ent
        img = np.asarray(Image.open(img_path).convert('RGB'), np.uint8)
        lbl = (np.asarray(Image.open(label_path), np.int32)
               if label_path is not None else None)
        with self._access_lock:
            self._decoded_cache.setdefault(idx, (img, lbl))
        return self._decoded_cache[idx]

    def _native_train_item(self, rng, idx, img_path, label_path):
        """Whole-sample C++ pipeline (nn/native.py decode_augment_sample):
        JPEG+PNG decode and the fused scale-crop-flip-normalize run in one
        GIL-free native call, so loader threads parallelize for real (the
        torch reference needs worker processes for this,
        pixelssl/task_template/proxy.py:374-380). Geometry distribution
        matches random_scale_crop; resize is point-sampled bilinear rather
        than PIL's antialiased filter. Returns None on decode failure.

        With --decoded-cache the decode happens once (PIL, kept as uint8)
        and only the fused scale-crop-flip-normalize runs natively per
        access — the SAME geometry rng stream either way, so the cached
        and fused paths see identical crops (pixels may differ by JPEG
        decoder rounding; tests/test_native_augment.py bounds it)."""
        from ...nn import native
        fill = 0 if label_path is not None else -1  # matches the PIL path
        if self._decoded_cache is not None:
            try:
                img, lbl = self._decoded(idx, img_path, label_path)
            except (IOError, OSError):
                return None  # unreadable file → PIL fallback error path
            resize_hw, crop_yx, flip = self._geometry(
                rng, img.shape[0], img.shape[1])
            aug = (native.augment_batch_raw if self._u8 else
                   lambda *a: native.augment_batch(*a, n_threads=1))
            out_im, out_lb = aug([img], [lbl], [resize_hw], [crop_yx],
                                 [flip], [fill], self.im_size)
            lb = out_lb[0]
            if self._u8_lbl and lb.dtype == np.int16:
                lb = lb.astype(np.uint8)  # -1 sentinel wraps to 255 (void)
            return (out_im[0],), (lb,)
        dims = self._dims_cache.get(idx)
        if dims is None:
            try:
                dims = native.jpeg_dims(img_path)  # header-only probe
            except IOError:
                return None  # unreadable header → PIL fallback
            with self._access_lock:
                self._dims_cache[idx] = dims
        h, w = dims
        resize_hw, crop_yx, flip = self._geometry(rng, h, w)
        decode = (native.decode_augment_sample_raw if self._u8
                  else native.decode_augment_sample)
        out = decode(img_path, label_path, resize_hw, crop_yx, flip, fill,
                     self.im_size)
        if out is None:
            return None
        lb = out[1]
        if self._u8_lbl and lb.dtype == np.int16:
            lb = lb.astype(np.uint8)  # -1 sentinel wraps to 255 (void)
        return (out[0],), (lb,)

    def __getitem__(self, idx):
        name = self.sample_list[idx]
        img_path = os.path.join(self.image_dir, name + '.jpg')
        label_path = os.path.join(self.label_dir, name + '.png')
        label_exists = os.path.exists(label_path)
        has_label = label_exists and not self.is_unlabeled(idx)

        if self.is_train and self._use_native:
            with self._access_lock:
                k = self._access_counts.get(idx, 0)
                self._access_counts[idx] = k + 1
            rng = np.random.default_rng((self._seed, idx, k))
            item = self._native_train_item(
                rng, idx, img_path, label_path if has_label else None)
            if item is not None:
                return item
            # decode failure → fall through to the PIL path (fresh rng
            # stream index k was consumed; draws below reuse it, which is
            # fine — the native and PIL streams only need to be internally
            # consistent)

        image = Image.open(img_path).convert('RGB')
        label = Image.open(label_path) if label_exists else None

        if self.is_train:
            with self._access_lock:
                k = self._access_counts.get(idx, 0)
                self._access_counts[idx] = k + 1
            rng = np.random.default_rng((self._seed, idx, k))
            lbl = label if label is not None else image.convert('L')
            image, lbl = random_scale_crop(rng, image, lbl,
                                           self.args.train_base_size, self.im_size)
            if rng.random() < 0.5:
                image = image.transpose(Image.FLIP_LEFT_RIGHT)
                lbl = lbl.transpose(Image.FLIP_LEFT_RIGHT)
            if self._u8:
                # u8 wire mode: raw RGB + narrow labels; normalization runs
                # on device (tasks/sseg/func.device_prep)
                img = np.asarray(image, dtype=np.uint8)
                ldt = np.uint8 if self._u8_lbl else np.int16
                if has_label:
                    gt = np.asarray(lbl, dtype=np.int16).astype(ldt)
                else:
                    # -1 sentinel; wraps to 255 (void) under uint8
                    gt = np.full(img.shape[:2], -1, np.int16).astype(ldt)
                return (img,), (gt,)
            img = normalize_image(image)
            if has_label:
                gt = np.asarray(lbl, dtype=np.int32)
            else:
                # fake label for unlabeled samples (reference data.py:104-105)
                gt = np.full(img.shape[:2], -1, dtype=np.int32)
            return (img,), (gt,)

        if label is None:
            logger.log_err('Val sample must have a label: {0}'.format(label_path))
        if self.args.val_rescaling:
            image, label = fixed_scale_resize(image, label, self.im_size)
        img = normalize_image(image)
        gt = np.asarray(label, dtype=np.int32)
        return (img,), (gt,)


class PascalVocAugDataset(PascalVocDataset):
    def __init__(self, args, is_train):
        super(PascalVocAugDataset, self).__init__(
            args, is_train,
            'ImageSets/Segmentation/train_aug.txt',
            'ImageSets/Segmentation/val.txt')


class PascalVocOriDataset(PascalVocDataset):
    def __init__(self, args, is_train):
        super(PascalVocOriDataset, self).__init__(
            args, is_train,
            'ImageSets/Segmentation/train.txt',
            'ImageSets/Segmentation/val.txt')


# ---------------------------------------------------------------------------
# Synthetic dataset (tests / benchmarks — no VOC download needed)
# ---------------------------------------------------------------------------

class SyntheticSsegDataset(data_template.TaskDataset):
    """Deterministic random images + blocky labels at im_size."""

    def __init__(self, args, is_train):
        super(SyntheticSsegDataset, self).__init__(args, is_train)
        n = args.synthetic_samples
        self.sample_list = ['synthetic_{0:05d}'.format(i) for i in range(n)]
        self.idxs = list(range(n))
        self.im_size = args.im_size or 64
        self.num_classes = args.num_classes
        self._seed = getattr(args, 'seed', 0) or 0
        # fold the dataset root into the RNG so distinct roots (labeled vs
        # --unlabeledset) yield distinct samples, not byte-identical copies
        self._root_key = data_template.dataset_root_key(args, is_train)

    def __getitem__(self, idx):
        rng = np.random.default_rng(
            (self._seed, 7919, self._root_key, idx))
        s = self.im_size
        img = rng.standard_normal((s, s, 3)).astype(np.float32)
        # blocky labels so the loss is learnable
        coarse = rng.integers(0, self.num_classes, (max(1, s // 8),) * 2)
        gt = np.kron(coarse, np.ones((8, 8), dtype=np.int64))[:s, :s].astype(np.int32)
        if self.is_unlabeled(idx):
            gt = np.full_like(gt, -1)
        return (img,), (gt,)
