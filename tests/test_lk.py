"""Pyramidal LK tests: known shifts + agreement with OpenCV."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from stereoslam_tpu.ops import fast as fast_ops
from stereoslam_tpu.ops.image import build_lk_pyramid
from stereoslam_tpu.ops.lk import pyramidal_lk
from tests.test_features import checker_image


def corner_points(img, n=80, margin=30):
    """Sample trackable points: FAST corners, like real frontend usage."""
    kps = fast_ops.detect_keypoints(jnp.asarray(img), n, border=margin)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    return xy.astype(np.float32)


def _track(img0, img1, pts, init=None, levels=4):
    p0 = build_lk_pyramid(jnp.asarray(img0), levels)
    p1 = build_lk_pyramid(jnp.asarray(img1), levels)
    pts_j = jnp.asarray(pts.astype(np.float32))
    init_j = pts_j if init is None else jnp.asarray(init.astype(np.float32))
    return pyramidal_lk(p0, p1, pts_j, init_j)


def test_translation_recovered(rng):
    img0 = checker_image(rng, 240, 320)
    shift = (7, -4)  # (dx, dy), well beyond one window but within pyramid range
    img1 = np.roll(np.roll(img0, shift[1], axis=0), shift[0], axis=1)
    pts = corner_points(img0, 60)
    res = _track(img0, img1, pts)
    ok = np.asarray(res.status)
    assert ok.mean() > 0.8
    flow = np.asarray(res.points) - pts
    med = np.median(flow[ok], axis=0)
    np.testing.assert_allclose(med, shift, atol=0.2)


def test_agrees_with_opencv(rng):
    img0 = checker_image(rng, 240, 320, n_blobs=150)
    # Smooth warp: small affine
    M = np.float32([[1.004, 0.002, 2.5], [-0.002, 0.996, -1.5]])
    img1 = cv2.warpAffine(img0, M, (320, 240))
    pts = corner_points(img0, 80)

    res = _track(img0, img1, pts)

    cv_next, cv_status, _ = cv2.calcOpticalFlowPyrLK(
        img0.astype(np.uint8),
        img1.astype(np.uint8),
        pts.reshape(-1, 1, 2),
        None,
        winSize=(11, 11),
        maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 30, 0.01),
    )
    cv_next = cv_next.reshape(-1, 2)
    cv_status = cv_status.ravel().astype(bool)

    both = np.asarray(res.status) & cv_status
    assert both.mean() > 0.6
    diff = np.linalg.norm(np.asarray(res.points)[both] - cv_next[both], axis=1)
    assert np.median(diff) < 0.5
    assert (diff < 1.0).mean() > 0.8


def test_initial_guess_helps_large_motion(rng):
    img0 = checker_image(rng, 240, 320)
    shift = 30  # too large for a 4-level pyramid without a prior
    img1 = np.roll(img0, shift, axis=1)
    pts = corner_points(img0, 40, margin=45)
    pts = pts[(pts[:, 0] < 320 - 45)]
    init = pts + np.array([shift - 2, 0], np.float32)  # close initial guess
    res = _track(img0, img1, pts, init=init)
    ok = np.asarray(res.status)
    flow = np.asarray(res.points) - pts
    assert ok.mean() > 0.7
    np.testing.assert_allclose(np.median(flow[ok], axis=0), [shift, 0], atol=0.3)


def test_status_false_for_flat_regions():
    img0 = np.full((200, 200), 128.0, np.float32)
    img1 = img0.copy()
    pts = np.array([[100.0, 100.0], [50.0, 50.0]], np.float32)
    res = _track(img0, img1, pts)
    assert not np.asarray(res.status).any()


def test_jit_compiles():
    img = np.zeros((64, 64), np.float32)
    img[20:30, 20:30] = 200.0
    p = build_lk_pyramid(jnp.asarray(img), 3)
    pts = jnp.asarray([[25.0, 25.0]])
    f = jax.jit(lambda a, b, x: pyramidal_lk(a, b, x, x))
    res = f(p, p, pts)
    np.testing.assert_allclose(np.asarray(res.points), [[25.0, 25.0]], atol=1e-3)
