"""Feature-kernel tests: FAST vs OpenCV, orientation, BRIEF invariances."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereoslam_tpu.ops import fast as fast_ops
from stereoslam_tpu.ops.brief import brief_descriptors
from stereoslam_tpu.ops.image import bilinear_sample, build_pyramid, gaussian_blur
from stereoslam_tpu.ops.orient import ic_angles


def checker_image(rng, h=240, w=320, n_blobs=120):
    """Synthetic textured image: random bright/dark blobs on a gradient."""
    img = np.tile(np.linspace(40, 90, w, dtype=np.float32), (h, 1))
    ys = rng.integers(20, h - 20, n_blobs)
    xs = rng.integers(20, w - 20, n_blobs)
    for y, x in zip(ys, xs):
        s = rng.integers(3, 7)
        val = rng.uniform(120, 250) if rng.uniform() > 0.5 else rng.uniform(0, 30)
        img[y : y + s, x : x + s] = val
    return img


def test_fast_agrees_with_opencv(rng):
    img = checker_image(rng)
    corner, score = jax.jit(lambda im: fast_ops.fast_response(im, 20.0))(jnp.asarray(img))
    ours = np.argwhere(np.asarray(corner))  # (n, 2) as (y, x)

    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
    kps = det.detect(img.astype(np.uint8), None)
    cv_pts = {(int(round(kp.pt[1])), int(round(kp.pt[0]))) for kp in kps}
    # Ignore a 3px border where roll wrap-around differs from OpenCV padding.
    ours_set = {(y, x) for y, x in ours if 3 <= y < img.shape[0] - 3 and 3 <= x < img.shape[1] - 3}
    cv_set = {(y, x) for (y, x) in cv_pts if 3 <= y < img.shape[0] - 3 and 3 <= x < img.shape[1] - 3}

    assert len(cv_set) > 50
    inter = len(ours_set & cv_set)
    # FAST decision rule is exact; small diffs only from uint8 vs f32 rounding.
    assert inter / len(cv_set) > 0.95
    assert inter / max(len(ours_set), 1) > 0.95


def test_detect_keypoints_capacity_and_spread(rng):
    img = checker_image(rng)
    kps = jax.jit(
        lambda im: fast_ops.detect_keypoints(im, 150, cell_size=16, border=16)
    )(jnp.asarray(img))
    n_valid = int(np.asarray(kps.valid).sum())
    assert 50 < n_valid <= 150
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    assert xy[:, 0].min() >= 16 and xy[:, 0].max() < img.shape[1] - 16
    # Spread: keypoints should span a good fraction of the image.
    assert np.ptp(xy[:, 0]) > img.shape[1] * 0.5
    assert np.ptp(xy[:, 1]) > img.shape[0] * 0.5
    # No duplicates.
    assert len({(float(x), float(y)) for x, y in xy}) == len(xy)


def test_detect_respects_forbid_mask(rng):
    img = checker_image(rng)
    h, w = img.shape
    forbid = np.zeros((h, w), bool)
    forbid[:, : w // 2] = True
    kps = fast_ops.detect_keypoints(
        jnp.asarray(img), 100, forbid_mask=jnp.asarray(forbid)
    )
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    assert len(xy) > 5
    assert xy[:, 0].min() >= w // 2


def test_forbid_mask_from_points():
    xy = jnp.asarray([[50.0, 60.0], [200.0, 100.0]])
    valid = jnp.asarray([True, False])
    mask = fast_ops.forbid_mask_from_points(240, 320, xy, valid, radius=10)
    m = np.asarray(mask)
    assert m[60, 50] and m[50, 40] and m[70, 60]
    assert not m[100, 200]  # invalid point must not splat
    assert not m[60, 75]


def test_ic_angle_gradient_direction():
    # A patch whose intensity increases along +x must yield angle ~ 0;
    # along +y must yield ~ pi/2.
    h = w = 64
    img_x = np.tile(np.linspace(0, 255, w, dtype=np.float32), (h, 1))
    img_y = img_x.T.copy()
    xy = jnp.asarray([[32.0, 32.0]])
    ang_x = float(np.asarray(ic_angles(jnp.asarray(img_x), xy))[0])
    ang_y = float(np.asarray(ic_angles(jnp.asarray(img_y), xy))[0])
    assert abs(ang_x) < 0.05
    assert abs(ang_y - np.pi / 2) < 0.05


def test_brief_rotation_consistency(rng):
    """Descriptor of a rotated patch with steered angle ~= original."""
    img = checker_image(rng, 200, 200)
    blurred = gaussian_blur(jnp.asarray(img))
    center = jnp.asarray([[100.0, 100.0]])

    d0 = brief_descriptors(blurred, center, jnp.asarray([0.0]))

    # Rotate image by 30 degrees about the center and re-extract with the
    # rotation fed in as the keypoint angle.
    M = cv2.getRotationMatrix2D((100, 100), -30.0, 1.0)  # image rotates -30°
    rot = cv2.warpAffine(img, M, (200, 200), flags=cv2.INTER_LINEAR)
    blurred_rot = gaussian_blur(jnp.asarray(rot))
    d1 = brief_descriptors(blurred_rot, center, jnp.asarray([np.deg2rad(30.0)]))

    ham = int(np.unpackbits(np.asarray(d0 ^ d1).view(np.uint8)).sum())
    assert ham < 60  # well below the 128 expected for unrelated patches

    # Unrelated patch should be near 128.
    d2 = brief_descriptors(blurred, jnp.asarray([[60.0, 140.0]]), jnp.asarray([0.0]))
    ham2 = int(np.unpackbits(np.asarray(d0 ^ d2).view(np.uint8)).sum())
    assert ham2 > 80


def test_pyramid_shapes():
    img = jnp.zeros((376, 1241), jnp.float32)
    pyr = build_pyramid(img, 8, 1.2)
    assert len(pyr) == 8
    assert pyr[0].shape == (376, 1241)
    assert pyr[1].shape == (int(round(376 / 1.2)), int(round(1241 / 1.2)))


def test_bilinear_sample_exact_and_interp():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    v = bilinear_sample(img, jnp.asarray([[1.0, 1.0], [1.5, 1.0], [1.0, 1.5]]))
    np.testing.assert_allclose(np.asarray(v), [5.0, 5.5, 7.0], atol=1e-5)
