"""Native augmentation library: numerics vs the PIL/numpy reference path."""

import numpy as np
import pytest

from pixelssl_tpu.nn import native


@pytest.mark.skipif(not native.available(),
                    reason='native library not built (make -C pixelssl_tpu/native)')
def test_native_augment_matches_reference_math():
    rng = np.random.default_rng(0)
    h, w = 37, 53
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    lbl = rng.integers(0, 21, (h, w)).astype(np.int32)

    crop = 32
    rh, rw = 64, 80
    cy, cx = 10, 20

    out_img, out_lbl = native.augment_batch(
        [img], [lbl], [(rh, rw)], [(cy, cx)], [False], [255], crop)

    # reference math: bilinear resize (half-pixel), crop, normalize
    from PIL import Image
    pim = Image.fromarray(img).resize((rw, rh), Image.BILINEAR)
    ref = np.asarray(pim, np.float32)[cy:cy + crop, cx:cx + crop] / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (ref - mean) / std
    # PIL's bilinear uses an antialias-off triangle filter ≈ the same
    # half-pixel convention; allow small tolerance
    np.testing.assert_allclose(out_img[0], ref, atol=0.35)
    # the bulk must match tightly
    frac_close = np.mean(np.abs(out_img[0] - ref) < 0.05)
    assert frac_close > 0.95

    # nearest label resize matches
    plb = Image.fromarray(lbl.astype(np.uint8)).resize((rw, rh), Image.NEAREST)
    ref_lbl = np.asarray(plb, np.int32)[cy:cy + crop, cx:cx + crop]
    assert np.mean(out_lbl[0] == ref_lbl) > 0.9  # convention differences at edges


@pytest.mark.skipif(not native.available(), reason='native library not built')
def test_native_augment_padding_and_flip():
    img = np.full((16, 16, 3), 128, np.uint8)
    img[:, :8] = 0  # left half black
    lbl = np.zeros((16, 16), np.int32)

    # negative crop origin → padding rows/cols; flip mirrors the output
    out_img, out_lbl = native.augment_batch(
        [img, img], [lbl, None], [(16, 16), (16, 16)],
        [(-4, -4), (0, 0)], [False, True], [255, -1], 16)
    # padded region: normalized zero pixels + ignore label
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(out_img[0][0, 0], (0 - mean) / std, atol=1e-5)
    assert out_lbl[0][0, 0] == 255
    # unlabeled sample gets fill everywhere
    assert np.all(out_lbl[1] == -1)
    # flip: black half should now be on the right
    assert out_img[1][8, -1].mean() < out_img[1][8, 0].mean()


@pytest.mark.skipif(not native.decode_available(),
                    reason='native decode not built')
def test_native_decode_augment_matches_pil(tmp_path):
    """Fused C++ JPEG/PNG decode + identity-geometry augment is bit-exact
    vs PIL decode (both are libjpeg underneath) + numpy normalize."""
    from PIL import Image
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (9, 12, 3), np.uint8)
    img = np.asarray(Image.fromarray(base).resize((120, 90), Image.BILINEAR))
    jp = str(tmp_path / 'x.jpg')
    Image.fromarray(img).save(jp, quality=92)

    # VOC-style palette label
    lbl = rng.integers(0, 21, (90, 120)).astype(np.uint8)
    pim = Image.fromarray(lbl, mode='P')
    pim.putpalette([i for i in range(256) for _ in range(3)])
    lp = str(tmp_path / 'x.png')
    pim.save(lp)

    assert native.jpeg_dims(jp) == (90, 120)

    out = native.decode_augment_sample(jp, lp, (90, 120), (5, 7), False,
                                       0, 64)
    assert out is not None
    out_img, out_lbl = out

    pil_img = np.asarray(Image.open(jp).convert('RGB'), np.uint8)
    pil_lbl = np.asarray(Image.open(lp), np.int32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (pil_img[5:69, 7:71].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_array_equal(out_img, ref.astype(np.float32))
    np.testing.assert_array_equal(out_lbl, pil_lbl[5:69, 7:71])

    # unlabeled: fills the label slot, still decodes the image
    out2 = native.decode_augment_sample(jp, None, (90, 120), (0, 0), True,
                                        -1, 64)
    assert out2 is not None and np.all(out2[1] == -1)

    # decode failure → None (not a crash)
    bad = str(tmp_path / 'bad.jpg')
    with open(bad, 'wb') as f:
        f.write(b'not a jpeg')
    assert native.decode_augment_sample(bad, None, (4, 4), (0, 0), False,
                                        -1, 4) is None


@pytest.mark.skipif(not native.decode_available(),
                    reason='native decode not built')
def test_dataset_native_path_matches_geometry_contract(tmp_path):
    """PascalVocDataset --native-augment end-to-end: the C++ path yields
    the same shapes/dtypes and deterministic repeats as the PIL path."""
    import argparse
    from PIL import Image
    from pixelssl_tpu.tasks.sseg import data as sseg_data

    root = tmp_path / 'voc'
    img_dir = root / 'JPEGImages'
    lbl_dir = root / 'SegmentationClassAug'
    set_dir = root / 'ImageSets' / 'Segmentation'
    for d in (img_dir, lbl_dir, set_dir):
        d.mkdir(parents=True)
    rng = np.random.default_rng(2)
    names = []
    for i in range(3):
        name = 'im{0}'.format(i)
        names.append(name)
        arr = rng.integers(0, 255, (50 + i, 60, 3), np.uint8)
        Image.fromarray(arr).save(str(img_dir / (name + '.jpg')))
        lb = rng.integers(0, 21, (50 + i, 60)).astype(np.uint8)
        Image.fromarray(lb, mode='L').save(str(lbl_dir / (name + '.png')))
    (set_dir / 'train_aug.txt').write_text('\n'.join(names) + '\n')
    (set_dir / 'val.txt').write_text('\n'.join(names) + '\n')

    def make(native_on):
        args = argparse.Namespace(
            trainset={'pascalvoc': str(root)}, valset={'pascalvoc': str(root)},
            im_size=32, train_base_size=48, val_rescaling=False,
            native_augment=native_on, seed=5, ignore_index=255,
            num_classes=21)
        return sseg_data.PascalVocAugDataset(args, is_train=True)

    ds = make(True)
    assert ds._use_native
    (img,), (gt,) = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert gt.shape == (32, 32) and gt.dtype == np.int32
    assert set(np.unique(gt)).issubset(set(range(21)) | {0})

    # determinism: same access index k ⇒ same sample from a fresh dataset
    ds2 = make(True)
    (img2,), (gt2,) = ds2[0]
    np.testing.assert_array_equal(img, img2)
    np.testing.assert_array_equal(gt, gt2)


@pytest.mark.skipif(not native.decode_available(),
                    reason='native decode not built')
def test_decoded_cache_matches_fused_path(tmp_path):
    """--decoded-cache: PIL-decode-once + native augment_batch must equal
    the fused decode_augment_sample path bit-exactly — same geometry rng
    stream (dataset _geometry), same C++ resample code, and PIL/native
    both decode via libjpeg (bit-exactness of the decoders themselves is
    asserted by test_native_decode_augment_matches_pil)."""
    import argparse
    from PIL import Image
    from pixelssl_tpu.tasks.sseg import data as sseg_data

    root = tmp_path / 'voc'
    img_dir = root / 'JPEGImages'
    lbl_dir = root / 'SegmentationClassAug'
    set_dir = root / 'ImageSets' / 'Segmentation'
    for d in (img_dir, lbl_dir, set_dir):
        d.mkdir(parents=True)
    rng = np.random.default_rng(3)
    names = []
    for i in range(3):
        name = 'im{0}'.format(i)
        names.append(name)
        arr = rng.integers(0, 255, (40 + 3 * i, 55, 3), np.uint8)
        Image.fromarray(arr).save(str(img_dir / (name + '.jpg')))
        lb = rng.integers(0, 21, (40 + 3 * i, 55)).astype(np.uint8)
        Image.fromarray(lb, mode='L').save(str(lbl_dir / (name + '.png')))
    (set_dir / 'train_aug.txt').write_text('\n'.join(names) + '\n')
    (set_dir / 'val.txt').write_text('\n'.join(names) + '\n')

    def make(cache_on):
        args = argparse.Namespace(
            trainset={'pascalvoc': str(root)}, valset={'pascalvoc': str(root)},
            im_size=32, train_base_size=48, val_rescaling=False,
            native_augment=True, decoded_cache=cache_on, seed=9,
            ignore_index=255, num_classes=21)
        return sseg_data.PascalVocAugDataset(args, is_train=True)

    fused, cached = make(False), make(True)
    assert cached._decoded_cache is not None
    for idx in range(3):
        for _ in range(2):  # two accesses: distinct augment draws each
            (fi,), (fg,) = fused[idx]
            (ci,), (cg,) = cached[idx]
            np.testing.assert_array_equal(fi, ci)
            np.testing.assert_array_equal(fg, cg)
    assert len(cached._decoded_cache) == 3  # decode happened once per image

    # unlabeled samples (no label file on disk) fill -1 through the cache
    (lbl_dir / 'im0.png').unlink()
    c2 = make(True)
    (_, ), (g2,) = c2[0]
    assert np.all(g2 == -1)
