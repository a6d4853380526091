"""C++ prefetching loader: build, decode correctness, ordering."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def png_sequence(tmp_path_factory, ):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("seq")
    (d / "image_0").mkdir()
    (d / "image_1").mkdir()
    n = 12
    imgs = []
    for i in range(n):
        l = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        r = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        cv2.imwrite(str(d / "image_0" / f"{i:06d}.png"), l)
        cv2.imwrite(str(d / "image_1" / f"{i:06d}.png"), r)
        imgs.append((l, r))
    with open(d / "times.txt", "w") as f:
        for i in range(n):
            f.write(f"{i * 0.1:.6f}\n")
    return d, imgs


def test_native_loader_decodes_in_order(png_sequence):
    d, imgs = png_sequence
    try:
        from stereoslam_tpu.native import dataloader
    except Exception as e:
        pytest.skip(f"native toolchain unavailable: {e}")

    from stereoslam_tpu.utils.kitti import load_image_paths

    lp, rp, ts = load_image_paths(str(d))
    try:
        out = list(dataloader.stream_pairs(lp, rp, ts, prefetch=3, n_threads=2))
    except Exception as e:
        pytest.skip(f"native build failed: {e}")

    assert len(out) == len(imgs)
    for i, (l, r, t) in enumerate(out):
        np.testing.assert_array_equal(l, imgs[i][0])
        np.testing.assert_array_equal(r, imgs[i][1])
        assert abs(t - i * 0.1) < 1e-6


def test_kitti_frames_fallback(png_sequence):
    d, imgs = png_sequence
    from stereoslam_tpu.utils import kitti

    out = list(kitti.frames(str(d)))
    assert len(out) == len(imgs)
    np.testing.assert_array_equal(out[3][0], imgs[3][0])
