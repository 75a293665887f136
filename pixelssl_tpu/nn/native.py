"""ctypes binding for the native augmentation library.

Loads ``pixelssl_tpu/native/libpixelssl_augment.so`` (built with
``make -C pixelssl_tpu/native``) and exposes ``augment_batch``: a fused
resize+crop+flip+normalize over a list of decoded uint8 images, producing
the float32 image batch and int32 label batch in one multithreaded C++
pass. Returns None-capable ``lib()`` so callers fall back to the PIL path
when the library isn't built.
"""

import ctypes
import functools
import os

import numpy as np


@functools.lru_cache(maxsize=1)
def lib():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        'native', 'libpixelssl_augment.so')
    if not os.path.exists(path):
        return None
    try:
        l = ctypes.CDLL(path)
    except OSError:
        return None
    l.augment_batch.restype = ctypes.c_int
    if hasattr(l, 'augment_batch_raw'):
        l.augment_batch_raw.restype = ctypes.c_int
    if hasattr(l, 'decode_augment_sample'):
        l.decode_augment_sample.restype = ctypes.c_int
        l.decode_augment_sample.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
    if hasattr(l, 'decode_augment_sample_raw'):
        l.decode_augment_sample_raw.restype = ctypes.c_int
        l.decode_augment_sample_raw.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int16)]
    if hasattr(l, 'jpeg_dims'):
        l.jpeg_dims.restype = ctypes.c_int
        l.jpeg_dims.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_int32)]
    return l


def available():
    return lib() is not None


def decode_available():
    l = lib()
    return l is not None and hasattr(l, 'decode_augment_sample')


def raw_available():
    """u8-wire variants present (decode_augment_sample_raw +
    augment_batch_raw)."""
    l = lib()
    return (l is not None and hasattr(l, 'decode_augment_sample_raw')
            and hasattr(l, 'augment_batch_raw'))


def jpeg_dims(path):
    """(h, w) from the JPEG header — no full decode."""
    l = lib()
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = l.jpeg_dims(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError('jpeg_dims failed for {0}'.format(path))
    return int(h.value), int(w.value)


def decode_augment_sample(image_path, label_path, resize_hw, crop_yx, flip,
                          label_fill, crop_size):
    """Fused C++ JPEG/PNG decode + scale-crop-flip-normalize of ONE sample.

    ctypes drops the GIL for the call, so loader threads parallelize the
    whole file->tensor path. Returns (float32 [crop,crop,3],
    int32 [crop,crop]) or None on decode failure (caller falls back to
    PIL).
    """
    l = lib()
    out_image = np.empty((crop_size, crop_size, 3), np.float32)
    out_label = np.empty((crop_size, crop_size), np.int32)
    rc = l.decode_augment_sample(
        image_path.encode(),
        label_path.encode() if label_path is not None else None,
        ctypes.c_int(resize_hw[0]), ctypes.c_int(resize_hw[1]),
        ctypes.c_int(crop_yx[0]), ctypes.c_int(crop_yx[1]),
        ctypes.c_int(1 if flip else 0), ctypes.c_int(label_fill),
        ctypes.c_int(crop_size),
        out_image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_label.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return out_image, out_label


def decode_augment_sample_raw(image_path, label_path, resize_hw, crop_yx,
                              flip, label_fill, crop_size):
    """u8-wire variant of decode_augment_sample: returns (uint8
    [crop,crop,3] RGB, int16 [crop,crop] label) — 3.2x fewer bytes to
    transfer; the task's device_prep hook normalizes on the accelerator."""
    l = lib()
    out_image = np.empty((crop_size, crop_size, 3), np.uint8)
    out_label = np.empty((crop_size, crop_size), np.int16)
    rc = l.decode_augment_sample_raw(
        image_path.encode(),
        label_path.encode() if label_path is not None else None,
        ctypes.c_int(resize_hw[0]), ctypes.c_int(resize_hw[1]),
        ctypes.c_int(crop_yx[0]), ctypes.c_int(crop_yx[1]),
        ctypes.c_int(1 if flip else 0), ctypes.c_int(label_fill),
        ctypes.c_int(crop_size),
        out_image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_label.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    if rc != 0:
        return None
    return out_image, out_label


def augment_batch(images, labels, resize_hw, crop_yx, flips, label_fills,
                  crop_size, n_threads=0):
    """Fused batch augmentation.

    images: list of uint8 [h,w,3]; labels: list of int32 [h,w] or None;
    resize_hw: [(rh, rw)] per sample; crop_yx: [(cy, cx)] crop origin in the
    resized image (may be negative → zero/ignore padding); flips: [bool];
    label_fills: [int] value for padded/unlabeled pixels.
    Returns (float32 [n,crop,crop,3], int32 [n,crop,crop]).
    """
    l = lib()
    assert l is not None, 'native augment library not built'
    n = len(images)
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    labels_c = [None if lb is None else np.ascontiguousarray(lb, dtype=np.int32)
                for lb in labels]

    img_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images])
    lbl_ptrs = (ctypes.POINTER(ctypes.c_int32) * n)(
        *[(lb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
           if lb is not None else ctypes.POINTER(ctypes.c_int32)())
          for lb in labels_c])

    def i32arr(vals):
        return np.ascontiguousarray(np.asarray(vals, np.int32))

    heights = i32arr([im.shape[0] for im in images])
    widths = i32arr([im.shape[1] for im in images])
    rh = i32arr([r[0] for r in resize_hw])
    rw = i32arr([r[1] for r in resize_hw])
    cy = i32arr([c[0] for c in crop_yx])
    cx = i32arr([c[1] for c in crop_yx])
    fl = i32arr([1 if f else 0 for f in flips])
    lf = i32arr(label_fills)

    out_images = np.empty((n, crop_size, crop_size, 3), np.float32)
    out_labels = np.empty((n, crop_size, crop_size), np.int32)

    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    rc = l.augment_batch(
        img_ptrs, lbl_ptrs, p32(heights), p32(widths), p32(rh), p32(rw),
        p32(cy), p32(cx), p32(fl), p32(lf),
        ctypes.c_int(n), ctypes.c_int(crop_size),
        out_images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(n_threads))
    assert rc == 0
    return out_images, out_labels


def augment_batch_raw(images, labels, resize_hw, crop_yx, flips,
                      label_fills, crop_size):
    """u8-wire variant of augment_batch: (uint8 [n,crop,crop,3],
    int16 [n,crop,crop]). Same geometry code; pixels are rounded to
    uint8 (≤0.5/255 quantization) and normalization happens on device."""
    l = lib()
    assert l is not None and hasattr(l, 'augment_batch_raw'), (
        'augment_batch_raw not built — run make -C pixelssl_tpu/native')
    n = len(images)
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    labels_c = [None if lb is None else np.ascontiguousarray(lb, dtype=np.int32)
                for lb in labels]

    img_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images])
    lbl_ptrs = (ctypes.POINTER(ctypes.c_int32) * n)(
        *[(lb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
           if lb is not None else ctypes.POINTER(ctypes.c_int32)())
          for lb in labels_c])

    def i32arr(vals):
        return np.ascontiguousarray(np.asarray(vals, np.int32))

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    heights = i32arr([im.shape[0] for im in images])
    widths = i32arr([im.shape[1] for im in images])
    rh = i32arr([r[0] for r in resize_hw])
    rw = i32arr([r[1] for r in resize_hw])
    cy = i32arr([c[0] for c in crop_yx])
    cx = i32arr([c[1] for c in crop_yx])
    fl = i32arr([1 if f else 0 for f in flips])
    lf = i32arr(label_fills)

    out_images = np.empty((n, crop_size, crop_size, 3), np.uint8)
    out_labels = np.empty((n, crop_size, crop_size), np.int16)
    rc = l.augment_batch_raw(
        img_ptrs, lbl_ptrs, p32(heights), p32(widths), p32(rh), p32(rw),
        p32(cy), p32(cx), p32(fl), p32(lf),
        ctypes.c_int(n), ctypes.c_int(crop_size),
        out_images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    assert rc == 0
    return out_images, out_labels
