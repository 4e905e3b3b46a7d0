"""Viterbi decoder tests: hand-checkable graphs + exhaustive-oracle parity.

Closes the reference's biggest test gap — it has NO decoder test at all
(SURVEY.md §4).  The oracle is an unpruned exhaustive Viterbi (tests/oracle.py)
so on small graphs the device decoder must reproduce its exact 1-best words
and cost whenever the beam capacity covers all states.
"""

import dataclasses

import numpy as np
import pytest

from oracle import viterbi_oracle
from pocketkaldi_tpu.decoder import ViterbiDecoder
from pocketkaldi_tpu.fst import Fst
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.tools.make_fixtures import make_decoding_graph


def tiny_linear_fst():
    """0 --a:w1/1--> 1 --b:w2/0.5--> 2(final 0.25); plus a worse parallel arc."""
    return Fst.from_arcs(
        num_states=3, start_state=0,
        arcs=[
            (0, 1, 1, 1, 1.0),
            (0, 1, 2, 2, 5.0),   # worse alternative emitting pdf 2/word 2
            (1, 2, 2, 2, 0.5),
        ],
        finals={2: 0.25})


def test_hand_checked_linear():
    fst = tiny_linear_fst()
    tid2pdf = np.array([0, 0, 1], dtype=np.int32)  # tid 1→pdf0, tid 2→pdf1
    # Two frames; pdf log-likes chosen so the cheap path wins clearly.
    scores = np.array([[2.0, -1.0], [0.0, 3.0]], dtype=np.float32)
    dec = ViterbiDecoder(fst, tid2pdf,
                         DecoderOptions(max_active=8, expand_factor=4,
                                        chunk_frames=4))
    hyp = dec.decode(scores[None])[0]
    # path: frame0 arc(0→1, tid1): w=1, ac=-2; frame1 arc(1→2, tid2): w=0.5,
    # ac=-3; final 0.25 → total = 1-2+0.5-3+0.25 = -3.25
    assert hyp.words == [1, 2]
    assert hyp.total_cost == pytest.approx(-3.25, abs=1e-5)
    # reference-compat weight double-adds the final (decoder.cc:314,336)
    assert hyp.weight == pytest.approx(-3.0, abs=1e-5)
    assert hyp.num_frames == 2


def test_epsilon_word_chain():
    """Words emitted on epsilon arcs must appear, in order, incl. init closure."""
    fst = Fst.from_arcs(
        num_states=5, start_state=0,
        arcs=[
            (0, 1, 0, 7, 0.1),   # init-closure eps arc emitting word 7
            (1, 2, 1, 0, 0.2),   # emitting, no word
            (2, 3, 0, 8, 0.3),   # eps word 8
            (3, 4, 2, 9, 0.4),   # emitting with word 9
        ],
        finals={4: 0.0})
    tid2pdf = np.array([0, 0, 1], dtype=np.int32)
    scores = np.zeros((2, 2), dtype=np.float32)
    dec = ViterbiDecoder(fst, tid2pdf, DecoderOptions(max_active=8,
                                                      expand_factor=4))
    hyp = dec.decode(scores[None])[0]
    assert hyp.words == [7, 8, 9]
    assert hyp.total_cost == pytest.approx(1.0, abs=1e-5)


def test_no_reachable_final():
    fst = Fst.from_arcs(
        num_states=2, start_state=0,
        arcs=[(0, 1, 1, 1, 0.0), (1, 0, 1, 0, 0.0)],
        finals={})  # no final state at all
    tid2pdf = np.array([0, 0], dtype=np.int32)
    scores = np.zeros((3, 1), dtype=np.float32)
    dec = ViterbiDecoder(fst, tid2pdf, DecoderOptions(max_active=4,
                                                      expand_factor=4))
    hyp = dec.decode(scores[None])[0]
    assert hyp.empty
    assert hyp.weight == 0.0  # reference returns weight 0 (decoder.cc:320)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_oracle_parity_random_graphs(seed):
    rng = np.random.RandomState(seed)
    num_states, num_tids, num_pdfs, num_words, t = 40, 30, 12, 10, 15
    fst = make_decoding_graph(rng, num_states, num_tids, num_words)
    tid2pdf = rng.randint(0, num_pdfs, size=num_tids + 1).astype(np.int32)
    scores = (rng.randn(t, num_pdfs) * 2.0).astype(np.float32)

    want_words, want_cost = viterbi_oracle(fst, tid2pdf, scores)

    # beam capacity covers every state → exact parity with unpruned oracle
    dec = ViterbiDecoder(fst, tid2pdf,
                         DecoderOptions(max_active=64, expand_factor=16,
                                        beam=1e9, chunk_frames=6))
    hyp = dec.decode(scores[None])[0]
    assert hyp.total_cost == pytest.approx(want_cost, rel=1e-5), \
        f"cost mismatch: {hyp.total_cost} vs oracle {want_cost}"
    assert hyp.words == want_words


@pytest.mark.full
def test_batch_position_invariance():
    """Transcripts must not depend on batch position (SURVEY.md §7 M4 gate)."""
    rng = np.random.RandomState(42)
    fst = make_decoding_graph(rng, 30, 20, 8)
    tid2pdf = rng.randint(0, 10, size=21).astype(np.int32)
    dec = ViterbiDecoder(fst, tid2pdf,
                         DecoderOptions(max_active=64, expand_factor=8,
                                        chunk_frames=5))
    scores = (rng.randn(3, 12, 10) * 2.0).astype(np.float32)
    single = [dec.decode(scores[i][None])[0] for i in range(3)]
    batched = dec.decode(scores)
    for s, b in zip(single, batched):
        assert s.words == b.words
        assert s.total_cost == pytest.approx(b.total_cost, rel=1e-6)


@pytest.mark.full
def test_ragged_batch_num_frames():
    """Per-utterance frame counts: padding frames must be no-ops."""
    rng = np.random.RandomState(43)
    fst = make_decoding_graph(rng, 25, 15, 6)
    tid2pdf = rng.randint(0, 8, size=16).astype(np.int32)
    dec = ViterbiDecoder(fst, tid2pdf,
                         DecoderOptions(max_active=64, expand_factor=8,
                                        chunk_frames=4))
    t_max = 10
    scores = (rng.randn(2, t_max, 8) * 2.0).astype(np.float32)
    lengths = [6, 10]
    batched = dec.decode(scores, num_frames=lengths)
    for i, n in enumerate(lengths):
        solo = dec.decode(scores[i, :n][None])[0]
        assert batched[i].words == solo.words
        assert batched[i].total_cost == pytest.approx(solo.total_cost,
                                                      rel=1e-6)
        assert batched[i].num_frames == n


def test_beam_pruning_keeps_one_best():
    """With a moderately tight beam the 1-best should survive pruning."""
    rng = np.random.RandomState(44)
    fst = make_decoding_graph(rng, 40, 30, 10)
    tid2pdf = rng.randint(0, 12, size=31).astype(np.int32)
    scores = (rng.randn(15, 12) * 2.0).astype(np.float32)
    want_words, want_cost = viterbi_oracle(fst, tid2pdf, scores)
    dec = ViterbiDecoder(fst, tid2pdf,
                         DecoderOptions(max_active=64, expand_factor=8,
                                        beam=16.0))
    hyp = dec.decode(scores[None])[0]
    assert hyp.words == want_words
    assert hyp.total_cost == pytest.approx(want_cost, rel=1e-5)


@pytest.mark.full
def test_offload_mode_matches_device_mode():
    """Both traceback modes must produce identical hypotheses."""
    rng = np.random.RandomState(45)
    fst = make_decoding_graph(rng, 35, 25, 9)
    tid2pdf = rng.randint(0, 10, size=26).astype(np.int32)
    scores = (rng.randn(3, 20, 10) * 2.0).astype(np.float32)
    base = DecoderOptions(max_active=64, expand_factor=8, chunk_frames=6)
    dev = ViterbiDecoder(fst, tid2pdf, base).decode(scores)
    off = ViterbiDecoder(
        fst, tid2pdf,
        DecoderOptions(max_active=64, expand_factor=8, chunk_frames=6,
                       offload_records=True)).decode(scores)
    for a, b in zip(dev, off):
        assert a.words == b.words
        assert a.total_cost == pytest.approx(b.total_cost, rel=1e-6)


@pytest.mark.full
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fold_matches_sweeps(seed):
    """Eps-folded decode == per-frame-sweep decode on random graphs."""
    rng = np.random.RandomState(800 + seed)
    fst = make_decoding_graph(rng, 30, 48, 12)
    tid2pdf = (np.arange(49) % 16).astype(np.int32)
    scores = (rng.randn(2, 9, 16) * 2).astype(np.float32)

    base = DecoderOptions(max_active=64, expand_factor=16, chunk_frames=4)
    try:
        folded = ViterbiDecoder(fst, tid2pdf,
                                dataclasses.replace(base, fold_eps=True))
    except ValueError:
        # random graph drew a >2-word min-cost eps chain — unfoldable by
        # design; auto mode must then fall back to sweeps
        auto = ViterbiDecoder(fst, tid2pdf, base)
        assert not auto.graph.folded
        pytest.skip("graph legitimately unfoldable")
    swept = ViterbiDecoder(fst, tid2pdf,
                           dataclasses.replace(base, fold_eps=False))
    assert folded.graph.folded and not swept.graph.folded
    hf = folded.decode(scores)
    hs = swept.decode(scores)
    for a, b in zip(hf, hs):
        assert a.words == b.words
        assert a.total_cost == pytest.approx(b.total_cost, abs=1e-4)


def test_fold_two_word_eps_path():
    """A folded arc carrying two words must emit both, in order."""
    # 0 --tid1/pdf0:w0--> 1 --eps:w5--> 2 --eps:w6--> 3(final)
    fst = Fst.from_arcs(
        num_states=4, start_state=0,
        arcs=[
            (0, 1, 1, 0, 0.5),
            (1, 2, 0, 5, 0.25),
            (2, 3, 0, 6, 0.125),
        ],
        finals={3: 0.0})
    tid2pdf = np.array([0, 0], dtype=np.int32)
    scores = np.array([[1.0]], dtype=np.float32)   # one frame, pdf 0
    for fold in (True, False):
        dec = ViterbiDecoder(
            fst, tid2pdf,
            DecoderOptions(max_active=8, expand_factor=4, chunk_frames=2,
                           fold_eps=fold))
        assert dec.graph.folded is fold
        hyp = dec.decode(scores[None])[0]
        assert hyp.words == [5, 6], f"fold={fold}"
        assert hyp.total_cost == pytest.approx(0.5 - 1.0 + 0.25 + 0.125,
                                               abs=1e-5)


def test_deep_eps_chain_oracle():
    """A 20-deep epsilon chain decodes to oracle parity, unfolded.

    Regression (VERDICT r1 #4): the sweep count was silently clamped at 16,
    so eps chains deeper than 16 decoded wrong.  The bound is now the exact
    measured chain depth.
    """
    depth = 20
    # 0 --tid1--> 1 --eps:w--> 2 --eps--> ... --eps:w--> depth+1 (final)
    arcs = [(0, 1, 1, 0, 0.5)]
    arcs += [(1 + i, 2 + i, 0, (10 + i if i % 4 == 0 else 0), 0.01)
             for i in range(depth)]
    fst = Fst.from_arcs(depth + 2, 0, arcs, finals={depth + 1: 0.0})
    assert fst.eps_depth == depth and fst.eps_depth_bounded
    tid2pdf = np.array([0, 0], dtype=np.int32)
    scores = np.array([[1.0]], dtype=np.float32)   # one frame
    want_words, want_cost = viterbi_oracle(fst, tid2pdf, scores)

    dec = ViterbiDecoder(fst, tid2pdf,
                         DecoderOptions(max_active=32, expand_factor=8,
                                        chunk_frames=2, fold_eps=False))
    assert dec.frame_eps_iters == depth
    hyp = dec.decode(scores[None])[0]
    assert hyp.words == want_words == [10, 14, 18, 22, 26]
    assert hyp.total_cost == pytest.approx(want_cost, abs=1e-5)


def test_eps_cycle_unbounded_raises():
    """An eps cycle has no provable sweep bound → loud load-time error."""
    from pocketkaldi_tpu.errors import PkRuntimeError

    arcs = [
        (0, 1, 1, 0, 0.5),
        (1, 2, 0, 5, 0.1),   # eps cycle 1 → 2 → 1
        (2, 1, 0, 0, 0.1),
        (2, 3, 0, 6, 0.2),
    ]
    fst = Fst.from_arcs(4, 0, arcs, finals={3: 0.0})
    assert not fst.eps_depth_bounded
    tid2pdf = np.array([0, 0], dtype=np.int32)
    with pytest.raises(PkRuntimeError):
        ViterbiDecoder(fst, tid2pdf,
                       DecoderOptions(max_active=8, expand_factor=4,
                                      fold_eps=False))
    # an explicit sweep count is the caller's escape hatch
    dec = ViterbiDecoder(fst, tid2pdf,
                         DecoderOptions(max_active=8, expand_factor=4,
                                        fold_eps=False, max_eps_iters=4))
    hyp = dec.decode(np.array([[1.0]], dtype=np.float32)[None])[0]
    assert hyp.words == [5, 6]
    # folding handles the cycle exactly (cycles never improve the closure)
    folded = ViterbiDecoder(fst, tid2pdf,
                            DecoderOptions(max_active=8, expand_factor=4))
    assert folded.graph.folded
    hyp_f = folded.decode(np.array([[1.0]], dtype=np.float32)[None])[0]
    assert hyp_f.words == [5, 6]
    assert hyp_f.total_cost == pytest.approx(hyp.total_cost, abs=1e-5)


def test_expand_overflow_flagged():
    """A too-small expand budget is flagged, never silent (VERDICT r1 #5)."""
    rng = np.random.RandomState(46)
    num_states, num_tids, num_pdfs = 12, 10, 6
    arcs = []
    # state 0 fans out with 40 emitting arcs → multiple blocks per token
    for _ in range(40):
        arcs.append((0, int(rng.randint(1, num_states)),
                     int(rng.randint(1, num_tids + 1)), 0,
                     float(rng.rand())))
    for s in range(1, num_states):
        for _ in range(3):
            arcs.append((s, int(rng.randint(num_states)),
                         int(rng.randint(1, num_tids + 1)), 0,
                         float(rng.rand())))
    fst = Fst.from_arcs(num_states, 0, arcs,
                        finals={num_states - 1: 0.0})
    tid2pdf = rng.randint(0, num_pdfs, size=num_tids + 1).astype(np.int32)
    scores = (rng.randn(4, num_pdfs) * 2.0).astype(np.float32)

    tight = ViterbiDecoder(fst, tid2pdf,
                           DecoderOptions(max_active=8, expand_factor=1,
                                          chunk_frames=4))
    tight.decode(scores[None])
    assert tight.last_overflow_frames is not None
    assert tight.last_overflow_frames.sum() > 0, \
        "deliberate overflow must be flagged"

    ample = ViterbiDecoder(fst, tid2pdf,
                           DecoderOptions(max_active=64, expand_factor=16,
                                          chunk_frames=4))
    hyp = ample.decode(scores[None])[0]
    assert ample.last_overflow_frames.sum() == 0
    want_words, want_cost = viterbi_oracle(fst, tid2pdf, scores)
    assert hyp.words == want_words
    assert hyp.total_cost == pytest.approx(want_cost, rel=1e-5)


def test_fold_infeasible_three_words_falls_back():
    """Min-cost eps path with 3 words → auto mode falls back to sweeps."""
    arcs = [(0, 1, 1, 0, 0.5)]
    arcs += [(1 + i, 2 + i, 0, 7 + i, 0.1) for i in range(3)]  # 3 word-eps
    fst = Fst.from_arcs(5, 0, arcs, finals={4: 0.0})
    tid2pdf = np.array([0, 0], dtype=np.int32)
    auto = ViterbiDecoder(fst, tid2pdf,
                          DecoderOptions(max_active=8, expand_factor=4,
                                         chunk_frames=2))
    assert not auto.graph.folded
    with pytest.raises(ValueError):
        ViterbiDecoder(fst, tid2pdf,
                       DecoderOptions(max_active=8, expand_factor=4,
                                      chunk_frames=2, fold_eps=True))
    scores = np.array([[1.0]], dtype=np.float32)
    hyp = auto.decode(scores[None])[0]
    assert hyp.words == [7, 8, 9]
