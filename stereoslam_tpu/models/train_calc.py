"""Self-supervised training for the CALC-style loop-closure encoder.

CALC (the network behind the reference's DeepLCD, reference src/deeplcd.cpp)
is a convolutional autoencoder trained to reconstruct the HOG features of an
image from a *randomly warped* view of it — that objective is what makes its
bottleneck descriptor viewpoint-tolerant.  This module reproduces that
training loop in Flax/optax on any image source (synthetic sequences
included), so the framework can produce its own trained weights instead of
depending on a downloaded caffemodel (reference get_model.sh).

Usage::

    from stereoslam_tpu.models.train_calc import train_encoder
    params, history = train_encoder(images, steps=2000)
    model = calc.DescriptorModel(params)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from stereoslam_tpu.models import calc


class _Decoder(nn.Module):
    """Projection head mapping the descriptor to HOG feature space (training
    only; discarded at inference)."""

    hog_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = z.astype(self.dtype)
        x = nn.Dense(1024, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hog_dim, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def _random_warp(key, img: jnp.ndarray) -> jnp.ndarray:
    """Random homography-ish warp: rotation + scale + translation, bilinear."""
    h, w = img.shape
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (), minval=-0.15, maxval=0.15)
    scale = jax.random.uniform(k2, (), minval=0.9, maxval=1.1)
    shift = jax.random.uniform(k3, (2,), minval=-0.08, maxval=0.08) * jnp.asarray([w, h])
    c, s = jnp.cos(ang) * scale, jnp.sin(ang) * scale
    cx, cy = w / 2.0, h / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    src_x = c * xs + s * ys + cx + shift[0]
    src_y = -s * xs + c * ys + cy + shift[1]
    from stereoslam_tpu.ops.image import bilinear_sample

    grid = jnp.stack([jnp.broadcast_to(src_x, (h, w)), jnp.broadcast_to(src_y, (h, w))], axis=-1)
    return bilinear_sample(img, grid)


def train_encoder(
    images: np.ndarray,
    steps: int = 1000,
    batch: int = 16,
    lr: float = 1e-3,
    seed: int = 0,
) -> Tuple[Dict, List[float]]:
    """Train the CALC encoder on (N, H, W) grayscale images.

    The objective: descriptor(warp(image)) must predict hog(image) — the
    viewpoint-invariance pressure from the CALC paper.

    Returns (encoder_params, loss_history).
    """
    enc = calc.CalcEncoder()
    hog_dim = calc.hog_features(jnp.zeros(calc.INPUT_HW, jnp.float32)).shape[0]
    dec = _Decoder(hog_dim=hog_dim)

    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros(calc.INPUT_HW, jnp.float32)
    enc_params = enc.init(key, dummy)
    dec_params = dec.init(key, enc.apply(enc_params, dummy))
    params = {"enc": enc_params, "dec": dec_params}

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    # Preprocess the corpus once (blur + resize to 120x160, [0,1]).
    pre = jax.jit(jax.vmap(calc.preprocess))
    corpus = np.asarray(pre(jnp.asarray(images.astype(np.float32))))

    hog_t = jax.vmap(calc.hog_features)

    def loss_fn(params, imgs, keys):
        warped = jax.vmap(_random_warp)(keys, imgs)
        z = enc.apply(params["enc"], warped)
        pred = dec.apply(params["dec"], z)
        target = hog_t(imgs)
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def step(params, opt_state, imgs, keys):
        loss, grads = jax.value_and_grad(loss_fn)(params, imgs, keys)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    history: List[float] = []
    for i in range(steps):
        idx = rng.integers(0, len(corpus), batch)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, batch)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(corpus[idx]), keys)
        if i % 50 == 0 or i == steps - 1:
            history.append(float(loss))
    return params["enc"], history


def save_params(path: str, params) -> None:
    import pickle

    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)


def load_params(path: str):
    import pickle

    with open(path, "rb") as f:
        raw = pickle.load(f)
    return jax.tree.map(jnp.asarray, raw)
