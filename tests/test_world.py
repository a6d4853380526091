"""Tests for the photometrically realistic synthetic world (utils/world.py).

This is the validation asset demanded by the reference's own evaluation
story (reference result/trajectory.txt is a saved KITTI-00 run): a
perspective-correct textured scene with exact ground-truth poses and
depth, standing in for real KITTI imagery which cannot be shipped.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereoslam_tpu.utils.world import (
    make_city_circuit,
    render_frame,
    circuit_poses,
    generate_world_sequence,
)

H, W, FX = 120, 188, 160.0
BASELINE = 0.54


@pytest.fixture(scope="module")
def scene():
    return make_city_circuit(90.0, 50.0, seed=3)


def _render(scene, T_wc, off=0.0, depth=False, key=None):
    f = jax.jit(
        lambda T: render_frame(
            T, scene.quads, FX, FX, W / 2, H / 2, H, W,
            cam_offset_x=off, noise_key=key, return_depth=depth,
        )
    )
    return f(jnp.asarray(T_wc, jnp.float32))


def test_render_deterministic_and_textured(scene):
    T = circuit_poses(1, 0.8, 90.0, 50.0, 14.0, start=5.0)[0]
    img1 = np.asarray(_render(scene, T))
    img2 = np.asarray(_render(scene, T))
    assert img1.shape == (H, W)
    np.testing.assert_array_equal(img1, img2)
    assert img1.min() >= 0.0 and img1.max() <= 255.0
    # Real texture: local contrast well above blob-splat smoothness.
    gy, gx = np.gradient(img1)
    assert np.median(np.abs(gx)) > 0.5


def test_depth_matches_stereo_disparity(scene):
    """left[y,x] must equal right[y, x - fx*b/z] exactly (same surfaces)."""
    T = circuit_poses(1, 0.8, 90.0, 50.0, 14.0, start=20.0)[0]
    imgL, depL = _render(scene, T, 0.0, depth=True)
    imgR = _render(scene, T, BASELINE)
    imgL, depL, imgR = map(np.asarray, (imgL, depL, imgR))

    ys, xs = np.mgrid[10 : H - 10 : 7, 10 : W - 10 : 7]
    z = depL[ys, xs]
    ok = np.isfinite(z) & (z > 2.0) & (z < 60.0)
    ys, xs, z = ys[ok], xs[ok], z[ok]
    disp = FX * BASELINE / z
    xr = xs - disp
    inb = (xr >= 1) & (xr <= W - 2)
    ys, xs, xr = ys[inb], xs[inb], xr[inb]
    x0 = np.floor(xr).astype(int)
    f = xr - x0
    interp = imgR[ys, x0] * (1 - f) + imgR[ys, x0 + 1] * f
    err = np.abs(imgL[ys, xs] - interp)
    # Texture is view-independent albedo; bilinear interp of the right image
    # should reconstruct the left sample to a few grey levels on most pixels
    # (occlusion boundaries and sub-pixel texture aliasing make the tail).
    assert np.median(err) < 6.0
    assert (err < 20.0).mean() > 0.8


def test_circuit_poses_geometry():
    L, Wd, r = 90.0, 50.0, 14.0
    perim = 2 * (L - 2 * r) + 2 * (Wd - 2 * r) + 2 * np.pi * r
    T = circuit_poses(400, perim / 399.0, L, Wd, r, corner_slow=1.0)
    # Rotation blocks orthonormal, camera on the ground plane.
    RtR = np.einsum("tij,tik->tjk", T[:, :3, :3], T[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (400, 1, 1)), atol=1e-9)
    np.testing.assert_allclose(T[:, 1, 3], 0.0, atol=1e-12)
    # Closed circuit: the last pose returns to the first (one full lap).
    np.testing.assert_allclose(T[-1, :3, 3], T[0, :3, 3], atol=0.5)


def test_generate_sequence_revisit():
    """Frames one perimeter apart must see the same place (high photometric
    similarity after the lap) while distant frames look different."""
    seq = generate_world_sequence(
        n_frames=6, h=H, w=W, fx=FX, step=0.8, seed=2, noise_sigma=0.0
    )
    assert seq.left.shape == (6, H, W)
    assert seq.T_cw.dtype == np.float32
    # stereo pair differs (parallax) but same exposure statistics
    assert np.abs(seq.left[0] - seq.right[0]).mean() > 0.5
    assert abs(seq.left[0].mean() - seq.right[0].mean()) < 6.0
