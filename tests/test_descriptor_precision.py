"""Precision of the shipped loop-closure descriptor at the reference's
operating point.

The reference's loop closer is precise because its trained CALC descriptor
separates true revisits from different places at absolute similarity
0.94 / 0.92 with at most 3 DB entries above the low threshold
(loopclosing.cpp:133-149, KITTI00-02.yaml:79-88).  These tests pin that
operating point for the packaged trained weights on HELD-OUT scenes (seed
band never touched by training — see train_calc.render_corpus_pairs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereoslam_tpu.models import calc
from stereoslam_tpu.models.train_calc import render_corpus_pairs


@pytest.fixture(scope="module")
def sims():
    params = calc.load_default_params()
    if params is None:
        pytest.fail("packaged CALC weights missing (models/calc_weights.npz)")
    # Held-out: seed 555 -> scene seeds 70001 + 555*131 + s, disjoint from
    # the training run (seed 0 -> 70001..70048) and the eval world seeds.
    A, B = render_corpus_pairs(n_places=48, n_scenes=4, h=120, w=188, fx=160.0,
                               seed=555)
    enc = calc.CalcEncoder()
    f = jax.jit(jax.vmap(lambda img: enc.apply(params, calc.preprocess(img))))
    za = np.asarray(f(jnp.asarray(A)))
    zb = np.asarray(f(jnp.asarray(B)))
    S = za @ zb.T
    return np.diag(S), S[~np.eye(len(S), dtype=bool)]


def test_descriptors_unit_norm():
    params = calc.load_default_params()
    enc = calc.CalcEncoder()
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (120, 188)), jnp.float32)
    d = enc.apply(params, calc.preprocess(img))
    assert d.shape == (calc.DESCRIPTOR_DIM,)
    np.testing.assert_allclose(float(jnp.linalg.norm(d)), 1.0, atol=1e-3)


def test_revisit_similarity_supports_high_threshold(sims):
    pos, _ = sims
    # Most true revisits must clear the 0.94 detection threshold.
    assert np.median(pos) >= 0.94, f"median revisit sim {np.median(pos):.3f}"
    assert (pos >= 0.94).mean() >= 0.6


def test_different_place_similarity_below_low_threshold(sims):
    _, neg = sims
    # Different places must (almost) never reach the 0.92 suspect threshold:
    # the reference rejects a detection with > 3 suspects above it.
    assert np.median(neg) < 0.6, f"median different-place sim {np.median(neg):.3f}"
    assert (neg >= 0.92).mean() < 0.01


def test_suspect_count_rule_satisfied(sims):
    """Per anchor, the number of different-place DB entries above the low
    threshold must be <= 3 for the vast majority of anchors (the
    max_above_low ambiguity veto, loopclosing.cpp:140-149)."""
    params = calc.load_default_params()
    A, B = render_corpus_pairs(n_places=48, n_scenes=4, h=120, w=188, fx=160.0,
                               seed=555)
    enc = calc.CalcEncoder()
    f = jax.jit(jax.vmap(lambda img: enc.apply(params, calc.preprocess(img))))
    za = np.asarray(f(jnp.asarray(A)))
    zb = np.asarray(f(jnp.asarray(B)))
    S = za @ zb.T
    off = S.copy()
    np.fill_diagonal(off, -1.0)
    suspects = (off >= 0.92).sum(axis=1)
    assert (suspects <= 3).mean() >= 0.95
