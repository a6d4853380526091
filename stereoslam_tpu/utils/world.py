"""Photometrically realistic synthetic world: ray-cast textured city circuit.

The reference is validated only on real KITTI imagery (reference
result/trajectory.txt — a saved KITTI-00 run).  KITTI itself cannot be
shipped, so this module renders the next-best thing: a perspective-correct
3D street scene — a closed city-block circuit of textured building facades
over a textured ground plane — with exact ground-truth poses.  Unlike the
blob splats in :mod:`stereoslam_tpu.utils.synthetic`, every pixel here is a
true projection of a fixed 3D surface with view-independent albedo, so
stereo disparity, LK flow, FAST corners, BRIEF descriptors and whole-image
place-recognition descriptors all behave as they do on real imagery:

- **Perspective-correct texture**: procedural multi-octave value noise +
  soft-thresholded blotches evaluated at the world-space hit point
  (no sprites; parallax and foreshortening are exact).
- **Analytic anti-aliasing**: each noise octave fades out as its wavelength
  approaches the pixel footprint, so distant walls don't shimmer between
  frames (shimmer destroys LK and inflates descriptor variance).
- **Distinct places**: every facade segment has its own hash salt, base
  brightness and texture scale, so place recognition is well-posed (streets
  look different) while the revisit at loop closure sees the *same* surfaces.

The renderer is a single jitted program: a ``lax.fori_loop`` over quads
keeps memory at O(H·W) (no (H,W,Q) buffers), and all texture evaluation is
elementwise math that XLA fuses into the ray-cast loop epilogue.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Quads",
    "WorldScene",
    "make_city_circuit",
    "render_frame",
    "generate_world_sequence",
]


class Quads(NamedTuple):
    """A batch of textured rectangles (the whole scene geometry)."""

    p0: jnp.ndarray        # (Q, 3) corner (world)
    eu: jnp.ndarray        # (Q, 3) first edge vector (length = width, m)
    ev: jnp.ndarray        # (Q, 3) second edge vector (length = height, m)
    salt: jnp.ndarray      # (Q,) uint32 texture seed
    base: jnp.ndarray      # (Q,) base brightness (0..255)
    contrast: jnp.ndarray  # (Q,) fbm contrast amplitude
    blotch: jnp.ndarray    # (Q,) blotch contrast amplitude
    freq: jnp.ndarray      # (Q,) fbm base frequency (cycles/m)
    bfreq: jnp.ndarray     # (Q,) blotch frequency (cycles/m)


@dataclasses.dataclass
class WorldScene:
    quads: Quads
    # Trajectory support (host side)
    centerline: np.ndarray    # (S, 2) path points (x, z)
    perimeter: float


# ---------------------------------------------------------------------------
# Procedural texture (hash noise, analytic anti-aliasing)
# ---------------------------------------------------------------------------


def _hash01(ix: jnp.ndarray, iy: jnp.ndarray, salt: jnp.ndarray) -> jnp.ndarray:
    """Deterministic lattice hash -> [0, 1) float."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        ^ iy.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        ^ salt.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
    )
    h = (h ^ (h >> 15)) * jnp.uint32(0x2C1B3C6D)
    h = (h ^ (h >> 12)) * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    return (h & jnp.uint32(0xFFFFFF)).astype(jnp.float32) * (1.0 / float(0x1000000))


def _value_noise(u: jnp.ndarray, v: jnp.ndarray, salt: jnp.ndarray) -> jnp.ndarray:
    """Smoothstep-interpolated value noise on the unit lattice (C1 — LK needs
    continuous gradients)."""
    iu, iv = jnp.floor(u), jnp.floor(v)
    fu, fv = u - iu, v - iv
    su = fu * fu * (3.0 - 2.0 * fu)
    sv = fv * fv * (3.0 - 2.0 * fv)
    iu = iu.astype(jnp.int32)
    iv = iv.astype(jnp.int32)
    n00 = _hash01(iu, iv, salt)
    n10 = _hash01(iu + 1, iv, salt)
    n01 = _hash01(iu, iv + 1, salt)
    n11 = _hash01(iu + 1, iv + 1, salt)
    return (n00 * (1 - su) + n10 * su) * (1 - sv) + (n01 * (1 - su) + n11 * su) * sv


_N_OCTAVES = 6


def _fbm(u, v, salt, freq, footprint):
    """Multi-octave value noise with analytic anti-aliasing: octave k fades
    out once its wavelength falls under ~2 pixel footprints (Nyquist)."""
    val = jnp.zeros_like(u)
    wsum = jnp.zeros_like(u)
    f = freq
    amp = 1.0
    for k in range(_N_OCTAVES):
        fade = jnp.clip(2.0 - 4.0 * footprint * f, 0.0, 1.0)
        val = val + amp * fade * _value_noise(u * f, v * f, salt + jnp.uint32(977 * k + 1))
        wsum = wsum + amp
        f = f * 2.1
        amp = amp * 0.55
    return val / jnp.maximum(wsum, 1e-6)


def _blotch(u, v, salt, freq, footprint):
    """Soft-thresholded noise: high-contrast curved regions whose boundaries
    give FAST corners; edge width grows with footprint (anti-aliased)."""
    n = _value_noise(u * freq, v * freq, salt + jnp.uint32(7919))
    n = 0.6 * n + 0.4 * _value_noise(u * freq * 2.7, v * freq * 2.7, salt + jnp.uint32(104729))
    edge = jnp.clip(0.8 * footprint * freq, 0.02, 0.45)
    return jnp.clip((n - 0.55 + edge) / (2.0 * edge), 0.0, 1.0)


def _speckle(u, v, salt, freq, footprint):
    """Sparse high-threshold dots (gravel / stones / bricks): isolated
    blob-like corners that FAST responds to strongly.  Signed output in
    [-1, 1]; amplitude fades with footprint like the finest fbm octave."""
    n = _value_noise(u * freq, v * freq, salt + jnp.uint32(55001))
    m = _value_noise(u * freq * 1.31 + 17.0, v * freq * 1.31, salt + jnp.uint32(77003))
    edge = jnp.clip(1.2 * footprint * freq, 0.04, 0.5)
    bright = jnp.clip((n - 0.72 + edge) / (2.0 * edge), 0.0, 1.0)
    dark = jnp.clip((m - 0.72 + edge) / (2.0 * edge), 0.0, 1.0)
    fade = jnp.clip(2.0 - 4.0 * footprint * freq, 0.0, 1.0)
    return fade * (bright - dark)


# ---------------------------------------------------------------------------
# Renderer
# ---------------------------------------------------------------------------


def render_frame(
    T_wc: jnp.ndarray,
    quads: Quads,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    h: int,
    w: int,
    cam_offset_x: float = 0.0,
    noise_key: Optional[jnp.ndarray] = None,
    noise_sigma: float = 1.5,
    return_depth: bool = False,
) -> jnp.ndarray:
    """Ray-cast one camera view of the scene. Returns (h, w) f32 in [0, 255].

    ``cam_offset_x``: camera-center offset along camera +x (the stereo right
    camera sits at +baseline, matching reference system.cpp:116 where the
    right extrinsic is a -baseline point shift).
    ``return_depth``: additionally return the exact per-pixel camera z-depth
    (+inf on sky) — ground truth for flow/stereo/triangulation tests.
    """
    R_wc = T_wc[:3, :3]
    c = T_wc[:3, 3] + R_wc[:, 0] * cam_offset_x

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 - cy) / fy
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 - cx) / fx
    dirs_c = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (h, w)),
            jnp.broadcast_to(ys[:, None], (h, w)),
            jnp.ones((h, w), jnp.float32),
        ],
        axis=-1,
    )
    d = dirs_c @ R_wc.T  # (h, w, 3) world-space ray directions (not unit)
    inv_dnorm = 1.0 / jnp.linalg.norm(d, axis=-1)

    Q = quads.p0.shape[0]
    big = jnp.float32(1e9)

    def body(i, carry):
        best_t, best_idx, best_a, best_b, best_cos = carry
        p0, eu, ev = quads.p0[i], quads.eu[i], quads.ev[i]
        lu2 = jnp.dot(eu, eu)
        lv2 = jnp.dot(ev, ev)
        n = jnp.cross(eu, ev)
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-9)
        denom = d @ n                           # (h, w)
        safe = jnp.where(jnp.abs(denom) > 1e-7, denom, 1e-7)
        t = jnp.dot(n, p0 - c) / safe           # (h, w)
        # local metric coordinates of the hit without materializing hit points
        oc = c - p0
        a = (jnp.dot(oc, eu) + t * (d @ eu)) / lu2
        b = (jnp.dot(oc, ev) + t * (d @ ev)) / lv2
        inside = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
        ok = inside & (t > 0.2) & (jnp.abs(denom) > 1e-7)
        better = ok & (t < best_t)
        cosw = jnp.abs(denom) * inv_dnorm
        return (
            jnp.where(better, t, best_t),
            jnp.where(better, i, best_idx),
            jnp.where(better, a * jnp.sqrt(lu2), best_a),
            jnp.where(better, b * jnp.sqrt(lv2), best_b),
            jnp.where(better, cosw, best_cos),
        )

    init = (
        jnp.full((h, w), big),
        jnp.full((h, w), -1, jnp.int32),
        jnp.zeros((h, w)),
        jnp.zeros((h, w)),
        jnp.ones((h, w)),
    )
    best_t, idx, a_m, b_m, cos_th = jax.lax.fori_loop(0, Q, body, init)

    hit = idx >= 0
    gi = jnp.maximum(idx, 0)
    salt = quads.salt[gi]
    base = quads.base[gi]
    contrast = quads.contrast[gi]
    blotch_amp = quads.blotch[gi]
    freq = quads.freq[gi]
    bfreq = quads.bfreq[gi]

    # Pixel footprint on the surface (m/px): range / focal, stretched by
    # obliquity (capped — grazing surfaces just go low-frequency).
    dist = best_t / jnp.maximum(inv_dnorm, 1e-6)  # metric range along the ray
    footprint = dist / fx / jnp.maximum(cos_th, 0.25)
    footprint = jnp.where(hit, footprint, 1.0)

    tex = _fbm(a_m, b_m, salt, freq, footprint)
    blo = _blotch(a_m, b_m, salt, bfreq, footprint)
    spk = _speckle(a_m, b_m, salt, freq * 4.0, footprint)
    surf = (
        base
        + contrast * (tex - 0.5) * 2.0
        + blotch_amp * (blo - 0.5)
        + (0.45 * contrast + 18.0) * spk
    )

    # Sky: smooth vertical gradient (featureless, like overcast sky).
    vgrad = jnp.broadcast_to(
        jnp.linspace(205.0, 160.0, h, dtype=jnp.float32)[:, None], (h, w)
    )
    img = jnp.where(hit, surf, vgrad)

    # Mild distance fade (atmospheric contrast loss — keeps far texture from
    # being as sharp as near texture, like real exposure).
    fade = jnp.where(hit, jnp.exp(-best_t / 400.0), 1.0)
    img = img * fade + (1.0 - fade) * 170.0

    img = jnp.clip(img, 0.0, 255.0)
    if noise_key is not None:
        img = img + noise_sigma * jax.random.normal(noise_key, (h, w))
        img = jnp.clip(img, 0.0, 255.0)
    if return_depth:
        # Ray param t IS the camera z-depth: camera-frame ray dirs have z=1.
        depth = jnp.where(hit, best_t, jnp.inf)
        return img, depth
    return img


def prng_keys(seeds) -> np.ndarray:
    """Vectorized host-side PRNG keys (threefry key = [0, seed] u32).

    ``jax.random.PRNGKey`` is a device computation — one tunnel round trip
    per call on remote TPU, which dominated corpus rendering.  Building the
    key data on the host is free and bit-identical.
    """
    seeds = np.asarray(seeds, np.uint64) & np.uint64(0xFFFFFFFF)
    out = np.zeros(seeds.shape + (2,), np.uint32)
    out[..., 1] = seeds.astype(np.uint32)
    return out


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "h", "w"))
def _render_chunk(T_batch, quads, fx, fy, cx, cy, h, w, cam_offset_x, noise_keys, noise_sigma):
    # cam_offset_x / noise_sigma stay traced: left and right cameras (and any
    # noise level) share ONE compiled program — compilation of the vmapped
    # ray-cast loop is ~90 s over the tunnel, dispatch is ~40 ms per 64 frames.
    return jax.vmap(
        lambda T, k: render_frame(
            T, quads, fx, fy, cx, cy, h, w,
            cam_offset_x=cam_offset_x, noise_key=k, noise_sigma=noise_sigma,
        )
    )(T_batch, noise_keys)


def render_frames_batched(
    T_wc: np.ndarray,
    quads: Quads,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    h: int,
    w: int,
    cam_offset_x: float = 0.0,
    noise_keys: Optional[np.ndarray] = None,
    noise_sigma: float = 1.5,
    chunk: int = 32,
) -> np.ndarray:
    """Render many frames per device call (vmap over poses, fixed-size chunks).

    One-at-a-time rendering pays a host->device dispatch round trip per frame
    — ruinous over a tunneled TPU (~1 s/frame observed).  Chunked vmap makes
    rendering compute-bound.  The last partial chunk is padded to ``chunk``
    so only one program is ever compiled.
    """
    n = len(T_wc)
    if noise_keys is None:
        noise_keys = prng_keys(np.arange(n))
    out = np.empty((n, h, w), np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        Tb = np.asarray(T_wc[lo:hi], np.float32)
        kb = np.asarray(noise_keys[lo:hi])
        if hi - lo < chunk:  # pad to the compiled batch shape
            pad = chunk - (hi - lo)
            Tb = np.concatenate([Tb, np.repeat(Tb[-1:], pad, 0)])
            kb = np.concatenate([kb, np.repeat(kb[-1:], pad, 0)])
        img = _render_chunk(
            jnp.asarray(Tb), quads, float(fx), float(fy), float(cx), float(cy),
            int(h), int(w), float(cam_offset_x), jnp.asarray(kb), float(noise_sigma),
        )
        out[lo:hi] = np.asarray(img)[: hi - lo]
    return out


# ---------------------------------------------------------------------------
# Scene construction: a closed city-block circuit
# ---------------------------------------------------------------------------

_GROUND_Y = 1.65      # camera height above ground (KITTI-like), y points down
_WALL_TOP_Y = -4.5    # building tops


def _facade_row(
    x0z0: np.ndarray,
    x1z1: np.ndarray,
    rng: np.random.Generator,
    setback_dir: np.ndarray,
    max_setback: float,
    quads: list,
) -> None:
    """Split the facade line x0z0->x1z1 into textured segments with random
    depth setbacks (vertical contrast edges between segments = trackable
    structure), plus a darker backdrop wall closing the gaps."""
    x0z0 = np.asarray(x0z0, np.float64)
    x1z1 = np.asarray(x1z1, np.float64)
    length = float(np.linalg.norm(x1z1 - x0z0))
    u = (x1z1 - x0z0) / max(length, 1e-9)
    s = 0.0
    while s < length - 1.0:
        seg = float(min(rng.uniform(5.0, 12.0), length - s))
        sb = float(rng.uniform(0.0, max_setback))
        a0 = x0z0 + u * s + setback_dir * sb
        p0 = np.array([a0[0], _GROUND_Y, a0[1]])
        eu = np.array([u[0] * seg, 0.0, u[1] * seg])
        ev = np.array([0.0, _WALL_TOP_Y - _GROUND_Y, 0.0])
        quads.append(
            dict(
                p0=p0, eu=eu, ev=ev,
                salt=int(rng.integers(1, 2**31)),
                base=float(rng.uniform(70.0, 160.0)),
                contrast=float(rng.uniform(35.0, 75.0)),
                blotch=float(rng.uniform(45.0, 105.0)),
                freq=float(rng.uniform(0.35, 0.9)),
                bfreq=float(rng.uniform(0.15, 0.45)),
            )
        )
        s += seg
    # Backdrop wall slightly behind the deepest setback.
    a0 = x0z0 + setback_dir * (max_setback + 0.8)
    p0 = np.array([a0[0], _GROUND_Y, a0[1]])
    eu = np.array([u[0] * length, 0.0, u[1] * length])
    ev = np.array([0.0, _WALL_TOP_Y - _GROUND_Y, 0.0])
    quads.append(
        dict(
            p0=p0, eu=eu, ev=ev,
            salt=int(rng.integers(1, 2**31)),
            base=float(rng.uniform(50.0, 90.0)),
            contrast=float(rng.uniform(15.0, 30.0)),
            blotch=float(rng.uniform(10.0, 30.0)),
            freq=float(rng.uniform(0.3, 0.6)),
            bfreq=float(rng.uniform(0.1, 0.3)),
        )
    )


def make_city_circuit(
    length: float = 90.0,
    width: float = 50.0,
    street_half: float = 5.0,
    corner_radius: float = 14.0,
    seed: int = 0,
) -> WorldScene:
    """Build a rectangular street circuit: textured ground plane, building
    facades lining both sides of every street (inner block + outer ring),
    each facade split into salt-distinct segments."""
    rng = np.random.default_rng(seed)
    quads: list = []

    L, W, s = length, width, street_half
    # Ground plane (one big quad).
    pad = 12.0
    quads.append(
        dict(
            p0=np.array([-s - pad, _GROUND_Y, -s - pad]),
            eu=np.array([L + 2 * (s + pad), 0.0, 0.0]),
            ev=np.array([0.0, 0.0, W + 2 * (s + pad)]),
            salt=int(rng.integers(1, 2**31)),
            base=95.0,
            contrast=45.0,
            blotch=35.0,
            freq=1.4,
            bfreq=0.6,
        )
    )

    # Inner block facades (facing outward into the street).  Corners of the
    # inner block: (s, s) .. (L - s, W - s) in (x, z).
    inner = [
        (np.array([s, s]), np.array([L - s, s]), np.array([0.0, -1.0])),
        (np.array([L - s, s]), np.array([L - s, W - s]), np.array([1.0, 0.0])),
        (np.array([L - s, W - s]), np.array([s, W - s]), np.array([0.0, 1.0])),
        (np.array([s, W - s]), np.array([s, s]), np.array([-1.0, 0.0])),
    ]
    # setback goes INTO the block (away from the street) = -normal
    for a, b, n in inner:
        _facade_row(a, b, rng, -n, 2.0, quads)

    # Outer ring facades (facing inward).  Ring at distance s outside the
    # centerline rectangle (0,0)..(L,W).
    outer = [
        (np.array([-s, -s]), np.array([L + s, -s]), np.array([0.0, 1.0])),
        (np.array([L + s, -s]), np.array([L + s, W + s]), np.array([-1.0, 0.0])),
        (np.array([L + s, W + s]), np.array([-s, W + s]), np.array([0.0, -1.0])),
        (np.array([-s, W + s]), np.array([-s, -s]), np.array([1.0, 0.0])),
    ]
    for a, b, n in outer:
        _facade_row(a, b, rng, -n, 2.5, quads)

    # Pad to a fixed quad count (duplicates of the ground quad — harmless:
    # equal-t duplicate hits never win the strict `t < best_t` test) so every
    # scene shares one compiled renderer program regardless of how the random
    # facade segmentation came out.
    _PAD_TO = 128
    if len(quads) > _PAD_TO:
        raise ValueError(f"scene has {len(quads)} quads > pad bound {_PAD_TO}")
    quads = quads + [quads[0]] * (_PAD_TO - len(quads))

    q = Quads(
        p0=jnp.asarray(np.stack([x["p0"] for x in quads]), jnp.float32),
        eu=jnp.asarray(np.stack([x["eu"] for x in quads]), jnp.float32),
        ev=jnp.asarray(np.stack([x["ev"] for x in quads]), jnp.float32),
        salt=jnp.asarray(np.array([x["salt"] for x in quads]), jnp.uint32),
        base=jnp.asarray(np.array([x["base"] for x in quads]), jnp.float32),
        contrast=jnp.asarray(np.array([x["contrast"] for x in quads]), jnp.float32),
        blotch=jnp.asarray(np.array([x["blotch"] for x in quads]), jnp.float32),
        freq=jnp.asarray(np.array([x["freq"] for x in quads]), jnp.float32),
        bfreq=jnp.asarray(np.array([x["bfreq"] for x in quads]), jnp.float32),
    )

    r = corner_radius
    perimeter = 2 * (L - 2 * r) + 2 * (W - 2 * r) + 2 * np.pi * r
    return WorldScene(quads=q, centerline=np.array([[0.0, 0.0]]), perimeter=float(perimeter))


def _rounded_rect_pose(s: np.ndarray, L: float, W: float, r: float):
    """Position (x, z) and heading (hx, hz) at arc length s along the
    rounded-rectangle centerline (0,0)-(L,0)-(L,W)-(0,W), starting at (r, 0)
    heading +x."""
    seg_lens = [
        L - 2 * r,            # straight along z=0, +x
        np.pi * r / 2,        # corner at (L-r, r)
        W - 2 * r,            # straight along x=L, +z
        np.pi * r / 2,        # corner at (L-r, W-r)
        L - 2 * r,            # straight along z=W, -x
        np.pi * r / 2,        # corner at (r, W-r)
        W - 2 * r,            # straight along x=0, -z
        np.pi * r / 2,        # corner at (r, r)
    ]
    P = sum(seg_lens)
    s = np.mod(s, P)

    pos = np.zeros((len(np.atleast_1d(s)), 2))
    head = np.zeros_like(pos)
    s = np.atleast_1d(s)
    acc = 0.0
    done = np.zeros(len(s), bool)
    for k, sl in enumerate(seg_lens):
        m = (~done) & (s < acc + sl + 1e-9)
        u = s[m] - acc
        if k == 0:
            pos[m] = np.stack([r + u, np.zeros_like(u)], 1)
            head[m] = [1.0, 0.0]
        elif k == 1:
            th = u / r
            pos[m] = np.stack([L - r + r * np.sin(th), r - r * np.cos(th)], 1)
            head[m] = np.stack([np.cos(th), np.sin(th)], 1)
        elif k == 2:
            pos[m] = np.stack([np.full_like(u, L), r + u], 1)
            head[m] = [0.0, 1.0]
        elif k == 3:
            th = u / r
            pos[m] = np.stack([L - r + r * np.cos(th), W - r + r * np.sin(th)], 1)
            head[m] = np.stack([-np.sin(th), np.cos(th)], 1)
        elif k == 4:
            pos[m] = np.stack([L - r - u, np.full_like(u, W)], 1)
            head[m] = [-1.0, 0.0]
        elif k == 5:
            th = u / r
            pos[m] = np.stack([r - r * np.sin(th), W - r + r * np.cos(th)], 1)
            head[m] = np.stack([-np.cos(th), -np.sin(th)], 1)
        elif k == 6:
            pos[m] = np.stack([np.zeros_like(u), W - r - u], 1)
            head[m] = [0.0, -1.0]
        else:
            th = u / r
            pos[m] = np.stack([r - r * np.cos(th), r - r * np.sin(th)], 1)
            head[m] = np.stack([np.sin(th), -np.cos(th)], 1)
        done |= m
        acc += sl
    return pos, head


@dataclasses.dataclass
class WorldSequence:
    """Same field layout as utils.synthetic.SyntheticSequence (drop-in for
    the test helpers and the system)."""

    left: np.ndarray
    right: np.ndarray
    T_cw: np.ndarray
    timestamps: np.ndarray
    baseline: float
    fx: float
    fy: float
    cx: float
    cy: float


def _corner_speed(s: np.ndarray, L: float, W: float, r: float, slow: float, ramp: float):
    """Speed factor along the circuit: ``slow`` inside corner arcs, ramping
    back to 1 within ``ramp`` meters — drivers brake for turns, and it keeps
    the per-frame yaw rate at realistic (KITTI-like) levels."""
    seg = [L - 2 * r, np.pi * r / 2, W - 2 * r, np.pi * r / 2,
           L - 2 * r, np.pi * r / 2, W - 2 * r, np.pi * r / 2]
    P = sum(seg)
    s = np.mod(s, P)
    bounds = np.cumsum([0.0] + seg)
    f = np.ones_like(s)
    for k in (1, 3, 5, 7):  # arc segments
        a0, a1 = bounds[k], bounds[k + 1]
        d = np.maximum.reduce([a0 - s, s - a1, np.zeros_like(s)])
        d = np.minimum(d, P - d)  # circular distance
        f = np.minimum(f, slow + (1.0 - slow) * np.clip(d / ramp, 0.0, 1.0))
    return f


def circuit_poses(
    n_frames: int,
    step: float,
    length: float,
    width: float,
    corner_radius: float,
    start: float = 0.0,
    corner_slow: float = 0.55,
    slow_ramp: float = 4.0,
) -> np.ndarray:
    """(T, 4, 4) ground-truth T_wc poses along the circuit centerline."""
    s = np.empty(n_frames)
    cur = float(start)
    for t in range(n_frames):
        s[t] = cur
        cur += step * float(
            _corner_speed(np.array([cur]), length, width, corner_radius,
                          corner_slow, slow_ramp)[0]
        )
    pos2, head2 = _rounded_rect_pose(s, length, width, corner_radius)
    T = np.tile(np.eye(4), (n_frames, 1, 1))
    yaw = np.arctan2(head2[:, 0], head2[:, 1])  # heading = (sin yaw, 0, cos yaw)
    c, sn = np.cos(yaw), np.sin(yaw)
    T[:, 0, 0] = c
    T[:, 0, 2] = sn
    T[:, 2, 0] = -sn
    T[:, 2, 2] = c
    T[:, 0, 3] = pos2[:, 0]
    T[:, 1, 3] = 0.0
    T[:, 2, 3] = pos2[:, 1]
    return T


def frames_per_lap(
    step: float = 0.8,
    length: float = 90.0,
    width: float = 50.0,
    corner_radius: float = 14.0,
    corner_slow: float = 0.55,
    slow_ramp: float = 4.0,
) -> int:
    """Number of frames in one full lap, accounting for corner slowdown
    (the arc-length integration circuit_poses actually performs)."""
    arc = np.pi * corner_radius / 2
    P = 2 * (length - 2 * corner_radius) + 2 * (width - 2 * corner_radius) + 4 * arc
    cur, n = 0.0, 0
    while cur < P:
        cur += step * float(
            _corner_speed(np.array([cur]), length, width, corner_radius,
                          corner_slow, slow_ramp)[0]
        )
        n += 1
    return n


def generate_world_sequence(
    n_frames: int = 240,
    h: int = 240,
    w: int = 376,
    fx: float = 320.0,
    baseline: float = 0.54,
    step: float = 0.8,
    length: float = 90.0,
    width: float = 50.0,
    corner_radius: float = 14.0,
    street_half: float = 5.0,
    seed: int = 0,
    noise_sigma: float = 1.5,
    cy_frac: float = 0.5,
    scene: Optional[WorldScene] = None,
) -> WorldSequence:
    """Render a stereo drive around the city circuit.

    One lap is ``perimeter/step`` frames; frames beyond that revisit the
    start of the circuit (the loop-closure event).
    """
    scene = scene or make_city_circuit(
        length, width, street_half=street_half, seed=seed, corner_radius=corner_radius
    )
    fy = fx
    cx = w / 2.0
    cy = h * cy_frac

    T_wc = circuit_poses(n_frames, step, length, width, corner_radius)

    keys_l = prng_keys(seed * 1000003 + 2 * np.arange(n_frames))
    keys_r = prng_keys(seed * 1000003 + 2 * np.arange(n_frames) + 1)
    lefts = render_frames_batched(
        T_wc, scene.quads, fx, fy, cx, cy, h, w,
        cam_offset_x=0.0, noise_keys=keys_l, noise_sigma=noise_sigma,
    )
    rights = render_frames_batched(
        T_wc, scene.quads, fx, fy, cx, cy, h, w,
        cam_offset_x=baseline, noise_keys=keys_r, noise_sigma=noise_sigma,
    )

    T_cw = np.linalg.inv(T_wc)
    return WorldSequence(
        left=np.stack(lefts),
        right=np.stack(rights),
        T_cw=T_cw.astype(np.float32),
        timestamps=np.arange(n_frames, dtype=np.float64) * 0.1,
        baseline=baseline,
        fx=fx,
        fy=fy,
        cx=cx,
        cy=cy,
    )
