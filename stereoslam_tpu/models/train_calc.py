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


def _jittered_pose(
    T: np.ndarray,
    rng: np.random.Generator,
    trans: Tuple[float, float, float] = (1.8, 0.4, 1.0),
    yaw: float = 0.35,
    pitch: float = 0.06,
) -> np.ndarray:
    """Random viewpoint perturbation of a T_wc pose (real-parallax jitter)."""
    T = T.copy()
    d = rng.uniform(-1.0, 1.0, 3) * np.asarray(trans)
    T[:3, 3] += T[:3, :3] @ d
    ya = rng.uniform(-yaw, yaw)
    pa = rng.uniform(-pitch, pitch)
    cy_, sy_ = np.cos(ya), np.sin(ya)
    cp_, sp_ = np.cos(pa), np.sin(pa)
    Ry = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
    Rx = np.array([[1, 0, 0], [0, cp_, -sp_], [0, sp_, cp_]])
    T[:3, :3] = T[:3, :3] @ (Ry @ Rx)
    return T


def render_corpus_pairs(
    n_places: int = 512,
    h: int = 240,
    w: int = 376,
    fx: float = 320.0,
    n_scenes: int = 8,
    seed: int = 0,
    noise_sigma: float = 1.5,
    revisit_trans: Tuple[float, float, float] = (1.0, 0.15, 1.5),
    revisit_yaw: float = 0.12,
    tiny_frac: float = 0.5,
    tiny_trans: Tuple[float, float, float] = (0.3, 0.05, 0.4),
    tiny_yaw: float = 0.03,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render (anchor, revisit) view pairs from several procedural city scenes.

    Each pair is two renders of the SAME place under independent viewpoint
    jitter — real parallax, the thing warp augmentation cannot produce
    (foreground occludes background differently between the views).  Places
    are drawn along each scene's street circuit; scenes vary in footprint
    and texture seed.  Fully deterministic in ``seed``.

    Returns two (n, h, w) f32 arrays A, B; (A[i], B[i]) is a true-revisit
    pair, and any (A[i], B[j≠i]) is a (usually hard) negative: same
    procedural texture family, different place.
    """
    import jax

    from stereoslam_tpu.utils.world import (
        circuit_poses,
        make_city_circuit,
        prng_keys,
        render_frames_batched,
    )

    rng = np.random.default_rng(seed)
    per_scene = n_places // n_scenes
    A = np.empty((per_scene * n_scenes, h, w), np.float32)
    B = np.empty_like(A)
    i = 0
    for s in range(n_scenes):
        L = float(rng.uniform(70.0, 110.0))
        Wd = float(rng.uniform(40.0, 60.0))
        # Scene seeds live in a band far from the small seeds used by tests
        # and evaluation worlds — held-out evaluation must never see a
        # texture-identical training scene.
        scene = make_city_circuit(L, Wd, seed=70001 + seed * 131 + s)
        starts = rng.uniform(0.0, scene.perimeter, per_scene)
        Tas, Tbs, kas, kbs = [], [], [], []
        for k in range(per_scene):
            T0 = circuit_poses(1, 0.8, L, Wd, 14.0, start=float(starts[k]))[0]
            Ta = _jittered_pose(T0, rng)
            Tas.append(Ta)
            # The revisit view is offset from A by a loop-closure
            # displacement (same street, roughly the same heading).  A
            # ``tiny_frac`` share of pairs uses near-identical poses — the
            # geometry an exact lap revisit presents (~0.2 m).  Descriptor
            # *stability* under those tiny offsets is what decides whether
            # the 0.94 threshold fires; training must penalize it directly.
            if rng.uniform() < tiny_frac:
                Tbs.append(_jittered_pose(Ta, rng, trans=tiny_trans, yaw=tiny_yaw))
            else:
                Tbs.append(_jittered_pose(Ta, rng, trans=revisit_trans, yaw=revisit_yaw))
            kas.append(prng_keys(seed * 7919 + 2 * (i + k)))
            kbs.append(prng_keys(seed * 7919 + 2 * (i + k) + 1))
        common = dict(
            quads=scene.quads, fx=fx, fy=fx, cx=w / 2.0, cy=h / 2.0, h=h, w=w,
            noise_sigma=noise_sigma,
        )
        A[i : i + per_scene] = render_frames_batched(
            np.stack(Tas), noise_keys=np.stack(kas), **common
        )
        B[i : i + per_scene] = render_frames_batched(
            np.stack(Tbs), noise_keys=np.stack(kbs), **common
        )
        i += per_scene
    return A, B


def preprocess_corpus(A) -> np.ndarray:
    """Blur+resize a corpus (array or list of arrays of any resolutions) to
    the network input size; returns one (N,) + INPUT_HW f32 array."""
    groups = list(A) if isinstance(A, (list, tuple)) else [A]
    out = []
    for g in groups:
        g = np.asarray(g, np.float32)
        pre = jax.jit(jax.vmap(calc.preprocess))
        buf = np.empty((len(g),) + calc.INPUT_HW, np.float32)
        for lo in range(0, len(g), 64):
            hi = min(lo + 64, len(g))
            buf[lo:hi] = np.asarray(pre(jnp.asarray(g[lo:hi])))
        out.append(buf)
    return np.concatenate(out, axis=0)


def _photometric(key, img: jnp.ndarray) -> jnp.ndarray:
    """Random gain/bias on a [0,1] image (exposure variation between visits)."""
    k1, k2 = jax.random.split(key)
    g = jax.random.uniform(k1, (), minval=0.75, maxval=1.3)
    b = jax.random.uniform(k2, (), minval=-0.08, maxval=0.08)
    return jnp.clip(img * g + b, 0.0, 1.2)


def train_encoder_pairs(
    A: np.ndarray,
    B: np.ndarray,
    steps: int = 3000,
    batch: int = 64,
    lr: float = 1e-3,
    seed: int = 0,
    contrastive_weight: float = 0.5,
    temperature: float = 0.07,
    margin_pos: float = 0.965,
    margin_neg: float = 0.55,
    hinge_weight: float = 4.0,
    weight_decay: float = 1e-4,
    log_every: int = 100,
    verbose: bool = False,
    probe_fn=None,
    probe_every: int = 500,
) -> Tuple[Dict, List[Tuple[float, float, float, float]]]:
    """Train the CALC encoder on real-parallax (anchor, revisit) pairs.

    Loss terms:

    1. **HOG reconstruction** (the CALC objective, CALC paper / reference
       deeplcd role): a decoder head reconstructs hog(A) from
       descriptor(warp(A)) — viewpoint-tolerant geometric content in the
       bottleneck, and a strong regularizer against texture memorization.
    2. **In-batch InfoNCE** on (enc(A_i), enc(B_i)) both directions —
       ranking pressure with in-batch hard negatives.
    3. **Absolute hinge calibration**: relu(margin_pos − sim(A_i, B_i)) and
       relu(sim(A_i, B_j≠i) − margin_neg).  The reference's shipped
       thresholds (0.94 / 0.92, KITTI00-02.yaml:79-80) are *absolute*
       similarities; ranking losses alone leave the scale free, so this
       term pins revisits above the high threshold and different places
       far below the low one.

    Photometric gain/bias augmentation on every encoder input decouples the
    descriptor from exposure; AdamW weight decay fights the dense head
    memorizing scene textures.

    Returns (encoder_params, history of (total, recon, contrastive, hinge)).
    """
    enc = calc.CalcEncoder()
    hog_dim = calc.hog_features(jnp.zeros(calc.INPUT_HW, jnp.float32)).shape[0]
    dec = _Decoder(hog_dim=hog_dim)

    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros(calc.INPUT_HW, jnp.float32)
    enc_params = enc.init(key, dummy)
    dec_params = dec.init(key, enc.apply(enc_params, dummy))
    params = {"enc": enc_params, "dec": dec_params}

    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    # A/B may be single (N, H, W) arrays or lists of arrays at DIFFERENT
    # render resolutions (after scale-consistent preprocess they all land on
    # INPUT_HW): training across resolutions is what makes the shipped
    # operating point hold for any camera, not just the training camera.
    corpA = preprocess_corpus(A)
    corpB = preprocess_corpus(B)
    n = len(corpA)

    hog_t = jax.vmap(calc.hog_features)

    def loss_fn(params, a, b, keys):
        kw, ka, kb, kwa, kwb = (keys[:, i] for i in range(5))
        warped = jax.vmap(_random_warp)(kw, a)
        warped = jax.vmap(_photometric)(kw, warped)
        zw = enc.apply(params["enc"], warped)
        recon = jnp.mean((dec.apply(params["dec"], zw) - hog_t(a)) ** 2)

        # Independent random warps on BOTH contrastive inputs: every epoch
        # sees a fresh effective pair, so the pair-level objective cannot be
        # satisfied by memorizing the finite (A_i, B_i) set — the round-3
        # failure mode (training hinge -> 0 while fresh pairs from the SAME
        # distribution scored 0.78).  The warp approximates extra viewpoint
        # change on top of the pairs' real parallax.
        za = enc.apply(
            params["enc"],
            jax.vmap(_photometric)(ka, jax.vmap(_random_warp)(kwa, a)),
        )
        zb = enc.apply(
            params["enc"],
            jax.vmap(_photometric)(kb, jax.vmap(_random_warp)(kwb, b)),
        )
        S = za @ zb.T                              # (B, B) unit-norm sims
        labels = jnp.arange(a.shape[0])
        logits = S / temperature
        ce = optax.softmax_cross_entropy_with_integer_labels
        contrast = 0.5 * (jnp.mean(ce(logits, labels)) + jnp.mean(ce(logits.T, labels)))

        pos = jnp.diag(S)
        off = ~jnp.eye(S.shape[0], dtype=bool)
        hinge = jnp.mean(jax.nn.relu(margin_pos - pos)) + jnp.mean(
            jax.nn.relu(jnp.where(off, S, -1.0) - margin_neg)
        )
        total = recon + contrastive_weight * contrast + hinge_weight * hinge
        return total, (recon, contrast, hinge)

    @jax.jit
    def step(params, opt_state, a, b, keys):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, a, b, keys)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    rng = np.random.default_rng(seed)
    history: List[Tuple[float, float, float, float]] = []
    best_score, best_params = -np.inf, None
    for i in range(steps):
        idx = rng.choice(n, batch, replace=False)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, batch * 5).reshape(batch, 5, 2)
        params, opt_state, loss, aux = step(
            params, opt_state, jnp.asarray(corpA[idx]), jnp.asarray(corpB[idx]), keys
        )
        if i % log_every == 0 or i == steps - 1:
            rec = (float(loss), float(aux[0]), float(aux[1]), float(aux[2]))
            history.append(rec)
            if verbose:
                print(f"step {i}: total {rec[0]:.4f} recon {rec[1]:.4f} "
                      f"contrast {rec[2]:.4f} hinge {rec[3]:.4f}", flush=True)
        if probe_fn is not None and (
            (i + 1) % probe_every == 0 or i == steps - 1
        ):
            score = float(probe_fn(params["enc"]))
            if verbose:
                print(f"step {i}: probe {score:.4f}"
                      f"{' (best)' if score > best_score else ''}", flush=True)
            if score > best_score:
                best_score = score
                best_params = jax.tree.map(np.asarray, params["enc"])
    if best_params is not None:
        return jax.tree.map(jnp.asarray, best_params), history
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
