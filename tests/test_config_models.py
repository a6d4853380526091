"""Config loader, descriptor model, viewer, and trajectory-format tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereoslam_tpu.config import SlamConfig, load_config, parse_opencv_yaml
from stereoslam_tpu.models import calc


def test_load_shipped_configs():
    cfg = load_config("config/KITTI00-02.yaml")
    assert cfg.camera.fx == 718.856
    assert cfg.camera.bf == 386.1448
    assert cfg.map.active_window == 7
    assert cfg.loop.similarity_high == 0.94
    assert not cfg.camera.need_undistortion


def test_load_reference_config_directly():
    """The reference repo's own YAML files must load unchanged."""
    import os

    path = "/root/reference/config/stereo/gray/KITTI00-02.yaml"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    cfg = load_config(path)
    assert cfg.camera.fx == 718.856
    assert cfg.features.n_init_features == 300
    assert cfg.loop.database_min_size == 50


def test_missing_keys_get_defaults(tmp_path):
    p = tmp_path / "partial.yaml"
    p.write_text("%YAML:1.0\nCamera.left.fx: 500.0\nCamera.bf: 250.0\n")
    cfg = load_config(str(p))
    assert cfg.camera.fx == 500.0
    assert cfg.features.n_levels == 8  # documented default, not silent zero


def test_invalid_value_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("%YAML:1.0\nCamera.bf: -5.0\n")
    with pytest.raises(ValueError):
        load_config(str(p))


def test_parse_opencv_yaml_types():
    kv = parse_opencv_yaml("%YAML:1.0\na.b: 3\nc.d: 1.5\ne: hello # comment\n")
    assert kv["a.b"] == 3 and isinstance(kv["a.b"], int)
    assert kv["c.d"] == 1.5
    assert kv["e"] == "hello"


# ---------------------------------------------------------------- descriptor
def test_hog_descriptor_deterministic_and_unit(rng):
    img = rng.uniform(0, 255, (240, 376)).astype(np.float32)
    d1 = np.asarray(calc.hog_descriptor(jnp.asarray(img)))
    d2 = np.asarray(calc.hog_descriptor(jnp.asarray(img)))
    np.testing.assert_array_equal(d1, d2)
    assert d1.shape == (calc.DESCRIPTOR_DIM,)
    np.testing.assert_allclose(np.linalg.norm(d1), 1.0, atol=1e-5)


def test_hog_descriptor_discriminates(rng):
    from tests.test_features import checker_image

    a = checker_image(rng, 240, 376)
    b = checker_image(np.random.default_rng(99), 240, 376)
    da = np.asarray(calc.hog_descriptor(jnp.asarray(a)))
    db = np.asarray(calc.hog_descriptor(jnp.asarray(b)))
    # Slightly shifted view of the same place stays close...
    a_shift = np.roll(a, 5, axis=1)
    ds = np.asarray(calc.hog_descriptor(jnp.asarray(a_shift)))
    assert float(da @ ds) > 0.95
    # ...while a different place scores lower.
    assert float(da @ db) < float(da @ ds)


def test_calc_encoder_forward(rng):
    enc = calc.CalcEncoder()
    img = jnp.asarray(rng.uniform(0, 1, calc.INPUT_HW).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), img)
    d = enc.apply(params, img)
    assert d.shape == (calc.DESCRIPTOR_DIM,)
    np.testing.assert_allclose(float(jnp.linalg.norm(d)), 1.0, atol=1e-3)
    model = calc.DescriptorModel(params)
    d2 = model(jnp.asarray(rng.uniform(0, 255, (376, 1241)).astype(np.float32)))
    assert d2.shape == (calc.DESCRIPTOR_DIM,)


# ---------------------------------------------------------------- viewer
def test_viewer_outputs(tmp_path, rng):
    from stereoslam_tpu.utils import viewer

    n = 20
    T = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    T[:, 2, 3] = -np.arange(n) * 0.5
    p1 = viewer.plot_trajectory(T, loop_edges=[(15, 2)], out_path=str(tmp_path / "t.png"))
    lm = rng.uniform(-5, 5, (100, 3))
    p2 = viewer.plot_map(lm, np.ones(100, bool), T, out_path=str(tmp_path / "m.png"))
    img = rng.uniform(0, 255, (100, 200))
    xy = rng.uniform(10, 90, (30, 2))
    p3 = viewer.draw_features(img, xy, np.ones(30, bool), out_path=str(tmp_path / "f.png"))
    import os

    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_calc_training_improves(rng):
    """A short CALC training run must reduce loss and produce a model whose
    descriptor separates same-place (warped) pairs from different places."""
    from stereoslam_tpu.models.train_calc import train_encoder
    from tests.test_features import checker_image

    imgs = np.stack([
        checker_image(np.random.default_rng(i), 120, 160, n_blobs=60)
        for i in range(24)
    ])
    params, history = train_encoder(imgs, steps=150, batch=8, lr=2e-3, seed=0)
    assert history[-1] < history[0] * 0.9, history

    # Ranking needs the pairs objective (contrastive + hinge, the shipped
    # training path): a reconstruction-only 150-step model's similarities
    # all sit at ~0.9999 and rank by noise.  Train on (image, shifted-image)
    # pairs and require same-place to beat different-place ON AVERAGE with a
    # real margin (single-pair comparisons are platform-noise lotteries).
    from stereoslam_tpu.models.train_calc import train_encoder_pairs

    B = np.stack([np.roll(im, 6, axis=1) for im in imgs])
    params2, _ = train_encoder_pairs(imgs, B, steps=150, batch=8, seed=0)
    model = calc.DescriptorModel(params2)
    f = jax.vmap(lambda im: model(im))
    za, zb = np.asarray(f(jnp.asarray(imgs))), np.asarray(f(jnp.asarray(B)))
    np.testing.assert_allclose(np.linalg.norm(za, axis=1), 1.0, atol=1e-3)
    S = za @ zb.T
    pos = np.diag(S).mean()
    neg = S[~np.eye(len(S), dtype=bool)].mean()
    assert pos > neg + 0.05, f"pos {pos:.4f} vs neg {neg:.4f}"
