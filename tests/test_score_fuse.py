"""Pallas fused candidate-scoring kernel vs the gather oracle.

Runs in interpreter mode so the numerics are validated on any backend;
the compiled path is exercised on TPU by the decoder integration (the
kernel is bit-identical by construction: single-nonzero dot products).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pocketkaldi_tpu.ops import score_fuse


@pytest.mark.parametrize("b,n,p", [(2, 4096, 3448), (1, 2048, 100),
                                   (3, 2048, 128)])
def test_fused_matches_gather(b, n, p):
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(b, p).astype(np.float32))
    pdf = jnp.asarray(rng.randint(0, p, (b, n), dtype=np.int32))
    weight = jnp.asarray(rng.rand(b, n).astype(np.float32))
    tok = jnp.asarray(rng.rand(b, n).astype(np.float32) * 10)

    got = score_fuse.fused_cand_cost(scores, pdf, weight, tok,
                                     interpret=True)
    want = score_fuse.reference_cand_cost(scores, pdf, weight, tok)
    # Single-nonzero dot products: exact, not approximately equal.
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_inf_weight_pad_lanes_stay_inf():
    rng = np.random.RandomState(1)
    b, n, p = 1, 2048, 300
    scores = jnp.asarray(rng.randn(b, p).astype(np.float32))
    pdf = jnp.zeros((b, n), jnp.int32)
    weight = jnp.full((b, n), jnp.inf, jnp.float32)
    tok = jnp.zeros((b, n), jnp.float32)
    got = score_fuse.fused_cand_cost(scores, pdf, weight, tok,
                                     interpret=True)
    assert np.all(np.isinf(np.asarray(got)))


def test_bad_n_rejected():
    scores = jnp.zeros((1, 10), jnp.float32)
    x = jnp.zeros((1, 100), jnp.float32)
    with pytest.raises(ValueError):
        score_fuse.fused_cand_cost(scores, x.astype(jnp.int32), x, x,
                                   interpret=True)
