"""Native runtime tests: C++ PNG decode + prefetching ring vs PIL oracle."""

import os

import numpy as np
import pytest
from PIL import Image

from vio_msckf_tpu.runtime import native_loader


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        p = str(d / f"{1403636579763555584 + i}.png")
        Image.fromarray(img, mode="L").save(p)
        paths.append((p, img))
    return paths


def test_native_build():
    assert native_loader.available(), "C++ runtime failed to build"


def test_decode_matches_pil(png_dir):
    for path, img in png_dir:
        out = native_loader.load_png_gray(path)
        np.testing.assert_array_equal(out, img)


def test_decode_rgb_and_16bit(tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(rgb, mode="RGB").save(p)
    out = native_loader.load_png_gray(p)
    assert out.shape == (20, 30)  # converted to gray without error


def test_prefetching_loader_ordered(png_dir):
    paths = [p for p, _ in png_dir]
    imgs = [i for _, i in png_dir]
    loader = native_loader.PrefetchingLoader(
        paths, width=64, height=48, ring=3, threads=3
    )
    seen = []
    for idx, frame in loader:
        np.testing.assert_array_equal(frame, imgs[idx])
        seen.append(idx)
    loader.close()
    assert seen == list(range(len(paths)))


def test_loader_throughput_smoke(png_dir):
    """Many passes through the ring to shake out races."""
    paths = [p for p, _ in png_dir] * 8
    loader = native_loader.PrefetchingLoader(
        paths, width=64, height=48, ring=4, threads=4
    )
    count = sum(1 for _ in loader)
    loader.close()
    assert count == len(paths)
