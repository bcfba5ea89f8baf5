"""Native libjpeg loader vs the OpenCV Python path."""

import os

import numpy as np
import pytest

from sm3x.native.loader import native_loader_available, decode_letterbox_batch
from sm3x.data.pipeline import ImageStore, decode_image, letterbox


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("jpgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(200, 300), (120, 90), (64, 64)]):
        # smooth images so JPEG decode differences stay tiny
        base = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        p = os.path.join(root, f"img{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_native_loader_builds():
    assert native_loader_available(), "g++/libjpeg native loader failed to build"


def test_native_matches_python_path(jpeg_files):
    if not native_loader_available():
        pytest.skip("no native loader")
    cache, crop = 128, 10
    canv, hw, ok = decode_letterbox_batch(jpeg_files, cache, crop, workers=2)
    assert ok.all()
    for i, p in enumerate(jpeg_files):
        img = decode_image(p)[:, :, :3]
        if crop > 0:
            img = img[crop:-crop, crop:-crop]
        want_canvas, (h, w) = letterbox(img, cache)
        assert tuple(hw[i]) == (h, w)
        got = canv[i][:h, :w].astype(np.int32)
        want = want_canvas[:h, :w].astype(np.int32)
        # decode is bit-identical (same libjpeg); resize kernels differ
        # slightly (area-average implementations) — allow small error
        assert np.mean(np.abs(got - want)) < 3.0
        # padding region zeroed
        assert canv[i][h:, :].sum() == 0


def test_non_jpeg_falls_back(tmp_path):
    import cv2

    p = os.path.join(tmp_path, "img.png")
    cv2.imwrite(p, np.zeros((50, 50, 3), np.uint8))
    canv, hw, ok = decode_letterbox_batch([p], 64, 0, workers=1)
    assert not ok[0]  # native path rejects PNG...
    store = ImageStore([p], cache_size=64, crop_amount=0)
    assert tuple(store.valid_hw[0]) == (50, 50)  # ...ImageStore still loads it
