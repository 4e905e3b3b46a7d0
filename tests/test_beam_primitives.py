"""Property tests for the decoder's device primitives.

Each primitive is checked against a direct numpy reference on randomized
inputs — the micro-level counterpart of the oracle parity tests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pocketkaldi_tpu.decoder.beam import (ArcBlocks, BLOCK, Beam, _cumsum_mxu,
                                          expand_blocks, expand_dense,
                                          select_beam, _build_blocks)


def random_blocks(rng, num_states, max_arcs_per_state=5, eps=False):
    srcs, nxt, pdf, ol, w = [], [], [], [], []
    for s in range(num_states):
        for _ in range(rng.randint(0, max_arcs_per_state + 1)):
            srcs.append(s)
            nxt.append(rng.randint(num_states))
            pdf.append(rng.randint(16))
            ol.append(rng.randint(8))
            w.append(rng.rand())
    return _build_blocks(num_states,
                         np.array(srcs, dtype=np.int64),
                         np.array(nxt, dtype=np.int32),
                         np.array(pdf, dtype=np.int32),
                         np.array(ol, dtype=np.int32),
                         np.array(w, dtype=np.float32)), \
        (np.array(srcs), np.array(nxt), np.array(pdf), np.array(ol),
         np.array(w, dtype=np.float32))


def test_build_blocks_roundtrip():
    rng = np.random.RandomState(90)
    blocks, (srcs, nxt, pdf, ol, w) = random_blocks(rng, 12)
    assert blocks.num_planes == 4          # [next, pdf, olabel, weight]
    ptr = np.asarray(blocks.blk_ptr)
    # packed rows are stored flat (NB+1, P·BLOCK); view as planes here
    packed = np.asarray(blocks.packed).reshape(-1, blocks.num_planes,
                                               blocks.block)
    # every real arc appears exactly once in its state's block range
    seen = 0
    for s in range(12):
        rows = packed[ptr[s]:ptr[s + 1]]
        weights = rows[:, -1, :].view(np.float32).reshape(-1)
        real = np.isfinite(weights)
        state_arcs = np.nonzero(srcs == s)[0]
        assert real.sum() == state_arcs.size
        got = sorted(zip(rows[:, 0, :].reshape(-1)[real],
                         rows[:, 1, :].reshape(-1)[real],
                         rows[:, 2, :].reshape(-1)[real],
                         weights[real]))
        want = sorted(zip(nxt[state_arcs], pdf[state_arcs], ol[state_arcs],
                          w[state_arcs]))
        for a, b in zip(got, want):
            assert a[:3] == b[:3]
            assert a[3] == pytest.approx(b[3])
        seen += real.sum()
    assert seen == srcs.size
    # pad row is all-inf
    assert np.isinf(packed[-1, -1, :].view(np.float32)).all()


def test_build_blocks_plane_layout():
    """Eps blocks carry 3 planes, folded-emit 5 — missing planes skipped."""
    rng = np.random.RandomState(95)
    srcs = np.array([0, 1, 1], dtype=np.int64)
    nxt = np.array([1, 0, 2], dtype=np.int32)
    ol = np.array([3, 0, 7], dtype=np.int32)
    w = np.array([0.5, 1.0, 2.0], dtype=np.float32)
    eps = _build_blocks(3, srcs, nxt, None, ol, w, with_pdf=False)
    assert eps.num_planes == 3 and not eps.has_pdf and not eps.has_ol2
    packed = np.asarray(eps.packed).reshape(-1, 3, eps.block)
    real = np.isfinite(packed[:, -1, :].view(np.float32).reshape(-1))
    assert sorted(packed[:, 1, :].reshape(-1)[real]) == [0, 3, 7]

    pdf = np.array([4, 5, 6], dtype=np.int32)
    ol2 = np.array([9, 0, 1], dtype=np.int32)
    folded = _build_blocks(3, srcs, nxt, pdf, ol, w, olabel2=ol2)
    assert folded.num_planes == 5 and folded.has_pdf and folded.has_ol2
    packed = np.asarray(folded.packed).reshape(-1, 5, folded.block)
    real = np.isfinite(packed[:, -1, :].view(np.float32).reshape(-1))
    assert sorted(packed[:, 3, :].reshape(-1)[real]) == [0, 1, 9]


@pytest.mark.parametrize("k", [64, 256, 2048])
def test_cumsum_mxu_exact(k):
    rng = np.random.RandomState(91)
    x = rng.randint(0, 5, size=k).astype(np.int32)
    got = np.asarray(_cumsum_mxu(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_select_beam_reference():
    rng = np.random.RandomState(92)
    n, k = 300, 16
    state = rng.randint(0, 30, size=n).astype(np.int32)
    cost = (rng.rand(n) * 40).astype(np.float32)
    prev = rng.randint(0, 99, size=n).astype(np.int32)
    word = rng.randint(0, 9, size=n).astype(np.int32)
    beam_width = np.float32(10.0)

    new_beam, new_prev, new_word = select_beam(
        jnp.asarray(state), jnp.asarray(cost), jnp.asarray(prev),
        jnp.asarray(word), k, jnp.asarray(beam_width))
    got_state = np.asarray(new_beam.state)
    got_cost = np.asarray(new_beam.cost)

    # numpy reference: beam-prune, per-state min, top-k
    best = cost.min()
    keep = cost <= best + beam_width
    per_state = {}
    for i in np.nonzero(keep)[0]:
        s = state[i]
        if s not in per_state or cost[i] < cost[per_state[s]]:
            per_state[s] = i
    survivors = sorted(per_state.values(), key=lambda i: cost[i])[:k]
    want = [(state[i], cost[i], prev[i], word[i]) for i in survivors]

    live = got_state >= 0
    assert live.sum() == len(want)
    for j, (s, c, p, wd) in enumerate(want):
        assert got_state[j] == s
        assert got_cost[j] == pytest.approx(c)
        assert np.asarray(new_prev)[j] == p
        assert np.asarray(new_word)[j] == wd
    assert np.isinf(got_cost[live.sum():]).all()


def test_dense_equals_flat_expansion():
    """Dense and flat expansion feed select_beam identical surviving sets."""
    rng = np.random.RandomState(93)
    blocks, _ = random_blocks(rng, 20)
    k = 8
    states = np.array([3, 7, -1, 0, 11, 19, 5, 2], dtype=np.int32)
    costs = (rng.rand(k) * 5).astype(np.float32)
    slots = np.arange(k, dtype=np.int32)

    outs = {}
    for name, fn in [
        ("dense", lambda: expand_dense(jnp.asarray(states),
                                       jnp.asarray(costs),
                                       jnp.asarray(slots), blocks)),
        ("flat", lambda: expand_blocks(jnp.asarray(states),
                                       jnp.asarray(costs),
                                       jnp.asarray(slots), blocks, 64)),
    ]:
        nxt, pdf, ol, ol2, w, tc, ts, ov = fn()
        assert not np.asarray(ov).any()
        cost = np.asarray(tc)[:, None] + np.asarray(w)
        entries = []
        for i in range(cost.shape[0]):
            for j in range(BLOCK):
                if np.isfinite(cost[i, j]):
                    entries.append((int(np.asarray(nxt)[i, j]),
                                    float(cost[i, j]),
                                    int(np.asarray(ts)[i]),
                                    int(np.asarray(ol)[i, j])))
        outs[name] = sorted(entries)
    assert outs["dense"] == outs["flat"]


@pytest.mark.parametrize("shape", [(3, 5, 2, 16), (8, 7, 3, 64),
                                   (32, 9, 2, 512)])
def test_traceback_chunk_oracle(shape):
    """Device traceback == direct numpy walk on random records.

    Regression: the original vmapped nested-scan form of traceback_chunk
    (scalar gather per generation per utterance) silently MISCOMPILED on
    XLA:TPU at (B, C, G, K) = (32, 64, 2, 8192) — wrong slots and words on
    random inputs.  The flat single-scan + take_along_axis form is verified
    here against the oracle across shapes (the failing TPU shape itself is
    exercised by bench runs; these sizes keep CPU CI fast).
    """
    from pocketkaldi_tpu.decoder.beam import StepRecord, traceback_chunk

    b, c, g, k = shape
    rng = np.random.RandomState(sum(shape))
    prev = rng.randint(0, k, size=shape).astype(np.int32)
    word = rng.randint(0, 50, size=shape).astype(np.int32)
    slot = rng.randint(0, k, size=(b,)).astype(np.int32)

    s_dev, w_dev = traceback_chunk(jnp.asarray(slot),
                                   StepRecord(jnp.asarray(prev),
                                              jnp.asarray(word)))

    out = np.zeros((b, c, g), np.int32)
    end = slot.copy()
    for i in range(b):
        si = int(end[i])
        for t in range(c - 1, -1, -1):
            for gg in range(g - 1, -1, -1):
                out[i, t, gg] = word[i, t, gg, si]
                si = int(prev[i, t, gg, si])
        end[i] = si
    np.testing.assert_array_equal(np.asarray(s_dev), end)
    np.testing.assert_array_equal(np.asarray(w_dev), out)


@pytest.mark.parametrize("n,p", [(64, 33), (512, 128), (6000, 3448),
                                 (16384, 257)])
def test_lookup_scores_exact(n, p):
    """MXU one-hot score lookup is bit-exact vs a plain gather."""
    from pocketkaldi_tpu.decoder.beam import lookup_scores

    rng = np.random.RandomState(n + p)
    scores = rng.randn(p).astype(np.float32)
    pdf = rng.randint(0, p, size=(n // 8, 8)).astype(np.int32)
    got = np.asarray(lookup_scores(jnp.asarray(scores), jnp.asarray(pdf)))
    np.testing.assert_array_equal(got, scores[pdf])


def test_lookup_scores_batched():
    """vmapped lookup matches per-row gathers (decoder usage pattern)."""
    import jax
    from pocketkaldi_tpu.decoder.beam import lookup_scores

    rng = np.random.RandomState(11)
    b, n, p = 4, 8192, 301
    scores = rng.randn(b, p).astype(np.float32)
    pdf = rng.randint(0, p, size=(b, n // 8, 8)).astype(np.int32)
    got = np.asarray(jax.vmap(lookup_scores)(jnp.asarray(scores),
                                             jnp.asarray(pdf)))
    want = np.take_along_axis(scores, pdf.reshape(b, -1),
                              axis=1).reshape(pdf.shape)
    np.testing.assert_array_equal(got, want)
