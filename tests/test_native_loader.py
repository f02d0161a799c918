"""Native C++ prefetch loader tests: decode correctness vs PIL,
ordering, ring wraparound, error paths."""

import os

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from tpuslam.io.native_loader import (NativeStereoLoader, decode_image,
                                      get_lib)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(9):
        img = rng.integers(0, 256, (48 + i, 64), dtype=np.uint8)
        p = str(d / f"{i:06d}.png")
        Image.fromarray(img).save(p)
        np.save(str(d / f"{i:06d}.npy"), img)
        paths.append(p)
    return d, paths


def test_builds(png_dir):
    assert get_lib() is not None


def test_decode_gray_png_matches_pil(png_dir):
    d, paths = png_dir
    for p in paths:
        ours = decode_image(p)
        ref = np.load(p.replace(".png", ".npy"))
        assert np.array_equal(ours, ref), p


def test_decode_rgb_png_luma(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(img).save(p)
    ours = decode_image(p)
    ref = np.asarray(Image.open(p).convert("L"))
    # PIL uses the same BT.601 weights; roundings may differ by 1
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_decode_pgm(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    p = str(tmp_path / "x.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n# comment\n30 20\n255\n")
        f.write(img.tobytes())
    assert np.array_equal(decode_image(p), img)


def test_prefetch_order_and_wraparound(png_dir):
    """9 frames through a 3-bank ring arrive in order, pixel-exact."""
    d, paths = png_dir
    loader = NativeStereoLoader(paths, paths, n_banks=3, n_threads=2)
    assert len(loader) == 9
    seen = 0
    for idx, left, right in loader:
        ref = np.load(paths[idx].replace(".png", ".npy"))
        assert np.array_equal(left, ref)
        assert np.array_equal(right, ref)
        assert idx == seen
        seen += 1
    assert seen == 9
    loader.close()


def test_decode_failure_raises(tmp_path, png_dir):
    d, paths = png_dir
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png at all")
    loader = NativeStereoLoader([paths[0], bad], [paths[0], bad],
                                n_banks=2)
    it = iter(loader)
    next(it)
    with pytest.raises(IOError):
        next(it)
    loader.close()


def test_missing_file_raises(png_dir):
    d, paths = png_dir
    loader = NativeStereoLoader([str(d / "nope.png")],
                                [str(d / "nope.png")])
    with pytest.raises(IOError):
        next(iter(loader))
    loader.close()
