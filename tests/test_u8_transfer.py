"""--u8-transfer: raw uint8 RGB + int16 labels over the host->device link,
normalized on device by the task device_prep hook (TPU build addition —
the reference normalizes on the CPU host, task/sseg/data.py:99; shipping
u8 cuts per-dispatch transfer bytes 3.2x on the tunnel-attached host).

Covers: (1) the native raw augment variants vs the float path (pixels
within the 0.5/255 rounding, labels exact); (2) device_prep == the host
normalize math; (3) a full run_script train+val pass in u8 mode on the
8-device CPU mesh with chunked multi-step dispatch, tracking the float
pipeline within the quantization-induced tolerance."""

import argparse
import collections

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelssl_tpu.nn import native
from pixelssl_tpu.tasks.sseg import data as sseg_data


def _make_voc(root, n=8, seed=4):
    from PIL import Image
    img_dir = root / 'JPEGImages'
    lbl_dir = root / 'SegmentationClassAug'
    set_dir = root / 'ImageSets' / 'Segmentation'
    for d in (img_dir, lbl_dir, set_dir):
        d.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n):
        name = 'im{0:03d}'.format(i)
        names.append(name)
        arr = rng.integers(0, 255, (44 + 2 * i, 52, 3), np.uint8)
        Image.fromarray(arr).save(str(img_dir / (name + '.jpg')))
        lb = rng.integers(0, 5, (44 + 2 * i, 52)).astype(np.uint8)
        Image.fromarray(lb, mode='L').save(str(lbl_dir / (name + '.png')))
    (set_dir / 'train_aug.txt').write_text('\n'.join(names) + '\n')
    (set_dir / 'val.txt').write_text('\n'.join(names) + '\n')
    return names


@pytest.mark.skipif(not native.raw_available(),
                    reason='native raw exports not built')
def test_raw_augment_matches_float_path():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    lbl = rng.integers(0, 21, (37, 53)).astype(np.int32)
    geo = dict(resize_hw=[(64, 80)], crop_yx=[(-3, 10)], flips=[True],
               label_fills=[255], crop_size=48)

    f_img, f_lbl = native.augment_batch([img], [lbl], **geo)
    u_img, u_lbl = native.augment_batch_raw([img], [lbl], **geo)
    assert u_img.dtype == np.uint8 and u_lbl.dtype == np.int16

    # labels identical (same nearest sampling, fill cast through int16)
    np.testing.assert_array_equal(u_lbl.astype(np.int32), f_lbl)

    # pixels: float path keeps the bilinear float, raw rounds to uint8 —
    # undo the normalization and compare in 0..255 space
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f_raw = (f_img[0] * std + mean) * 255.0
    assert np.max(np.abs(u_img[0].astype(np.float32) - f_raw)) <= 0.5 + 1e-3
    # pad region is exactly 0 in raw mode
    assert np.all(u_img[0][0, :, :] == 0) and np.all(u_lbl[0][0, :] == 255)


def test_device_prep_matches_host_normalize():
    from pixelssl_tpu.tasks.sseg.func import SemanticSegmentationFunc

    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    gt16 = rng.integers(-1, 5, (2, 16, 16)).astype(np.int16)
    args = argparse.Namespace(num_classes=5, ignore_index=255)
    fn = SemanticSegmentationFunc(args)

    batch = {'inp': (jnp.asarray(u8),), 'gt': (jnp.asarray(gt16),)}
    out = fn.device_prep(batch)
    assert out['inp'][0].dtype == jnp.float32
    assert out['gt'][0].dtype == jnp.int32
    host = sseg_data.normalize_image(u8)
    np.testing.assert_allclose(np.asarray(out['inp'][0]), host,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out['gt'][0]),
                                  gt16.astype(np.int32))

    # float batches pass through untouched (identity, same objects)
    fbatch = {'inp': (out['inp'][0],), 'gt': (out['gt'][0],)}
    assert fn.device_prep(fbatch) is fbatch


def test_u8_label_narrowing(tmp_path):
    """Labels ride uint8 when they fit a byte (num_classes <= 254,
    ignore_index 255): values identical to the int16 wire, the unlabeled
    -1 sentinel wraps to 255 (void — every consumer masks it identically
    to -1), and the encoding falls back to int16 when a task's label
    space does not fit."""
    root = tmp_path / 'voc'
    _make_voc(root, n=4)

    def mkds(**over):
        args = argparse.Namespace(
            im_size=32, train_base_size=40, val_rescaling=True,
            trainset={'pascal_voc_aug': [str(root)]},
            valset={'pascal_voc_aug': [str(root)]},
            num_classes=5, ignore_index=255, seed=3,
            u8_transfer=True, native_augment=False, decoded_cache=False)
        for k, v in over.items():
            setattr(args, k, v)
        return sseg_data.PascalVocAugDataset(args, is_train=True)

    ds = mkds()
    assert ds._u8_lbl
    (img, ), (gt, ) = ds[0]
    assert img.dtype == np.uint8 and gt.dtype == np.uint8

    # same sample through the int16 wire (same rng stream: fresh dataset,
    # access count 0 for idx 0) — byte-exact label values
    ds16 = mkds(num_classes=300)   # forces the int16 fallback
    assert not ds16._u8_lbl
    (img16, ), (gt16, ) = ds16[0]
    np.testing.assert_array_equal(gt.astype(np.int32), gt16.astype(np.int32))
    np.testing.assert_array_equal(img, img16)

    # unlabeled samples: -1 sentinel wraps to 255 under uint8
    ds_u = mkds()
    ds_u.is_unlabeled = lambda idx: True
    (_, ), (gt_u, ) = ds_u[0]
    assert gt_u.dtype == np.uint8 and np.all(gt_u == 255)

    # non-255 ignore_index keeps the int16 wire (255 would alias it)
    assert not mkds(ignore_index=254)._u8_lbl


def _cfg(tmp_path, root, exp_id, **over):
    c = collections.OrderedDict([
        ('exp_id', exp_id),
        ('out_path', str(tmp_path / 'out')),
        ('ssl_algorithm', 'ssl_mt'),
        ('trainset', {'pascal_voc_aug': [str(root)]}),
        ('valset', {'pascal_voc_aug': [str(root)]}),
        ('sublabeled_path', str(tmp_path / 'sub.txt')),
        ('num_workers', 0),
        ('im_size', 32),
        ('train_base_size', 40),
        ('val_rescaling', True),
        ('epochs', 1),
        ('batch_size', 1),             # per device (x8 mesh)
        ('unlabeled_batch_size', 0),   # overridden below for ssl
        ('ignore_unlabeled', False),
        ('steps_per_dispatch', 2),
        ('models', {'model': 'deeplabv2'}),
        ('optimizers', {'model': 'sgd'}),
        ('lrers', {'model': 'polynomiallr'}),
        ('criterions', {'model': 'sseg_criterion'}),
        ('lr', 1e-4),
        ('momentum', 0.9),
        ('backbone', 'resnet10'),
        ('num_classes', 5),
        ('log_freq', 1),
        ('val_freq', 1),
        ('checkpoint_freq', 100),
        ('seed', 7),
        ('cons_scale', 1.0),
        ('cons_rampup_epochs', 1),
        ('ema_decay', 0.99),
        ('bf16', False),
    ])
    c.update(over)
    return c


def test_u8_run_script_tracks_float_pipeline(tmp_path):
    """Full proxy run (two-stream ssl_mt, chunked 2-step dispatch, val) in
    u8 wire mode vs the float pipeline: identical geometry rng streams, so
    the only difference is the <=0.5/255 pixel quantization; after 2 small
    steps params must track within a loose-but-meaningful bound (a wiring
    bug — unnormalized input, wrong labels — blows up by orders more)."""
    import pixelssl_tpu
    from pixelssl_tpu.tasks import sseg

    root = tmp_path / 'voc'
    # labeled 24 / global labeled batch 16 -> 3 iters (one 2-step chunk
    # dispatch + one tail step); unlabeled 8 / global 8 -> 1 batch
    names = _make_voc(root, n=32)
    (tmp_path / 'sub.txt').write_text('\n'.join(names[:24]) + '\n')

    over = dict(batch_size=2, unlabeled_batch_size=1)
    p_f = pixelssl_tpu.run_script(
        _cfg(tmp_path, root, 'u8_off', **over),
        sseg, sseg.SemanticSegmentationProxy)
    p_u = pixelssl_tpu.run_script(
        _cfg(tmp_path, root, 'u8_on', u8_transfer=True, **over),
        sseg, sseg.SemanticSegmentationProxy)

    # the u8 loader really shipped uint8 (dataset-level contract)
    ds = p_u.train_loader.dataset
    base = getattr(ds, 'dataset', ds)
    assert base._u8
    (u8_img,), (u8_gt,) = base[0]
    # labels narrow to uint8 here (num_classes 5 <= 254, ignore 255)
    assert u8_img.dtype == np.uint8 and u8_gt.dtype == np.uint8

    s_f, s_u = p_f.ssl_algorithm.state, p_u.ssl_algorithm.state
    assert int(np.asarray(s_f['step'])) == int(np.asarray(s_u['step'])) == 3
    for a, b in zip(jax.tree.leaves(s_f['model']['params']),
                    jax.tree.leaves(s_u['model']['params'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=5e-3)
