"""Misc tools (reference tools/misc, SURVEY P24): dataset mean/std
computation and the JPG->PNG staging converter."""

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_channel_mean_std_excludes_padding(tmp_path):
    """Mean/std run over valid pixels only — letterbox padding must not
    bias the statistics."""
    from PIL import Image

    from sm3x.data.pipeline import ImageStore

    cal = _load("tools/misc/cal_mean_std.py", "cal_mean_std")
    rng = np.random.default_rng(0)
    paths = []
    pixels = []
    for i in range(4):
        img = rng.integers(0, 256, (30, 50, 3), dtype=np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(img).save(p, quality=100, subsampling=0)
        paths.append(p)
        pixels.append(np.asarray(Image.open(p)).reshape(-1, 3))
    store = ImageStore(paths, cache_size=64, crop_amount=0)
    mean, std = cal.channel_mean_std(store)
    px = np.concatenate(pixels).astype(np.float64) / 255.0
    # letterboxed canvases are 64x64 with black padding; matching the
    # direct per-pixel stats proves padding was excluded
    np.testing.assert_allclose(mean, px.mean(axis=0), atol=2e-2)
    np.testing.assert_allclose(std, px.std(axis=0), atol=2e-2)


def test_convert_tree_jpg_to_png(tmp_path):
    from PIL import Image

    proc = _load("tools/misc/process_data_for_gcs.py", "process_gcs")
    src = tmp_path / "src" / "sub"
    src.mkdir(parents=True)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    Image.fromarray(img).save(src / "a.jpg")
    Image.fromarray(img).save(src / "b.JPEG")
    (src / "skip.txt").write_text("not an image")

    n = proc.convert_tree(str(tmp_path / "src"), str(tmp_path / "dst"),
                          workers=2)
    assert n == 2
    assert sorted(os.listdir(tmp_path / "dst" / "sub")) == ["a.png", "b.png"]
    out = np.asarray(Image.open(tmp_path / "dst" / "sub" / "a.png"))
    assert out.shape == (20, 20, 3)
