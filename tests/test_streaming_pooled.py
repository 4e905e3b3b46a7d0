"""Pooled sharded streaming (VERDICT r2 #3): the occupancy-priced pool
composed with M5 streaming on the virtual 8-device CPU mesh.

Gates:
  * StreamSession over PooledStreamingDecoder → transcripts identical to
    the OFFLINE POOLED decoder (and hence to the per-lane decoder);
  * mid-stream rebalance (cross-shard token moves + epoch bridges) changes
    no transcript;
  * a deliberately tiny per-shard pool grows and stays exact;
  * record window and epoch bridges prune as lanes finish.
"""

import numpy as np
import pytest

import jax

from pocketkaldi_tpu.decoder import PooledViterbiDecoder
from pocketkaldi_tpu.decoder.streaming import StreamSession
from pocketkaldi_tpu.decoder.streaming_pooled import PooledStreamingDecoder
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.parallel.mesh import make_mesh
from pocketkaldi_tpu.tools.make_fixtures import make_decoding_graph

P = 10  # pdfs


def _foldable(seed, num_states=30, num_tids=20, num_words=8):
    for s in range(seed, seed + 50):
        rng = np.random.RandomState(s)
        fst = make_decoding_graph(rng, num_states, num_tids, num_words)
        if fst.eps_closure is not None:
            return fst
    raise AssertionError("no foldable graph in 50 seeds")


@pytest.fixture(scope="module")
def setup():
    fst = _foldable(90)
    rng = np.random.RandomState(90)
    tid2pdf = rng.randint(0, P, size=21).astype(np.int32)
    opts = DecoderOptions(max_active=64, expand_factor=8, chunk_frames=4,
                          fold_eps=True)
    mesh = make_mesh(jax.devices()[:8], model_parallel=1)
    return fst, tid2pdf, opts, mesh


def make_utts(rng, n, t_range=(5, 18)):
    return [(f"utt{i:04d}",
             (rng.randn(rng.randint(*t_range), P) * 2.0).astype(np.float32))
            for i in range(n)]


def offline_pooled(fst, tid2pdf, opts, utts):
    dec = PooledViterbiDecoder(fst, tid2pdf, opts)
    return {uid: dec.decode(scores[None])[0] for uid, scores in utts}


@pytest.mark.full
def test_pooled_session_matches_offline_pooled(setup):
    """64 sharded lanes (8/shard), staggered lengths → transcripts equal to
    the offline pooled decode."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(91)
    utts = make_utts(rng, 24)
    want = offline_pooled(fst, tid2pdf, opts, utts)

    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=64, mesh=mesh)
    got = StreamSession(sd, P).run(utts)

    assert set(got) == set(want)
    for uid in want:
        assert got[uid].words == want[uid].words, uid
        if np.isfinite(want[uid].total_cost):
            assert got[uid].total_cost == pytest.approx(
                want[uid].total_cost, rel=1e-5)
    assert len(sd.free_lanes()) == 64
    assert sd.resident_record_chunks == 0


def test_partial_hypotheses_non_destructive(setup):
    """partial_hypotheses peeks the 1-best-so-far without perturbing the
    session: a peeking run's final transcripts equal a control run's, the
    partials are monotone in frames_fed, and the last partial's word
    sequence agrees with the final result whenever the final head lands on
    the same token (best-cost vs best-final can differ legitimately)."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(97)
    utts = make_utts(rng, 4, t_range=(9, 14))
    c = opts.chunk_frames

    def drive(sd, peek):
        feeding = {}
        got = {}
        partial_frames = []
        for lane, (uid, scores) in enumerate(utts):
            sd.attach(lane, uid)
            feeding[lane] = (uid, scores, 0)
        while feeding:
            chunk = np.zeros((4, c, P), np.float32)
            valid = np.zeros((4, c), bool)
            for lane, (uid, scores, cur) in feeding.items():
                n = min(c, scores.shape[0] - cur)
                chunk[lane, :n] = scores[cur:cur + n]
                valid[lane, :n] = True
                feeding[lane] = (uid, scores, cur + n)
            sd.feed(chunk, valid)
            if peek:
                parts = sd.partial_hypotheses(sorted(feeding))
                for h in parts:
                    assert np.isfinite(h.total_cost) or not h.words
                partial_frames.append([h.num_frames for h in parts])
            done = [ln for ln, (_, s, cur) in feeding.items()
                    if cur >= s.shape[0]]
            for ln, hyp in zip(done, sd.finish_batch(done) if done else []):
                got[feeding.pop(ln)[0]] = hyp
        return got, partial_frames

    sd_ctl = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=4,
                                    mesh=None)
    want, _ = drive(sd_ctl, peek=False)
    sd_peek = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=4,
                                     mesh=None)
    got, pframes = drive(sd_peek, peek=True)

    assert set(got) == set(want)
    for uid in want:
        assert got[uid].words == want[uid].words, uid
        if np.isfinite(want[uid].total_cost):
            assert got[uid].total_cost == pytest.approx(
                want[uid].total_cost, rel=1e-6)
    # frames_fed advances monotonically across peeks
    for earlier, later in zip(pframes, pframes[1:]):
        for a, b in zip(earlier, later):
            assert b >= a


def test_pool_decays_after_burst_and_finish_kills_tokens():
    """r5 latency-rung findings, both halves:

    1. finish_batch KILLS finished lanes' tokens — without that they are
       carried through every later chunk and demand never falls;
    2. after DECAY_QUIET quiet feeds the pool shrinks back to a
       demand-covering rung (a synchronized attach flood otherwise grows
       the pool toward the provable cap and it stays there forever —
       measured 26.5 s/chunk at bench scale).

    Correctness is pinned by finishing a lane attached AFTER the decay and
    matching the offline pooled decode."""
    from pocketkaldi_tpu.decoder import PooledViterbiDecoder

    # 8 attached lanes cost ≥ 8·GROUP = 1024 slots (GROUP-rounding floors
    # per-lane cost) vs 1 quiet lane's 128 — an 8x demand swing on the
    # standard fixture graph, enough to force grow-then-decay from a
    # 128-slot pool.
    fst = _foldable(200)
    rng = np.random.RandomState(201)
    tid2pdf = rng.randint(0, P, size=21).astype(np.int32)
    opts = DecoderOptions(max_active=64, expand_factor=8, chunk_frames=2,
                          fold_eps=True, beam=1e9)
    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=8,
                                pool_size=128)
    kp0 = sd.pool_size
    for i in range(8):
        sd.attach(i, f"u{i}")
    for _ in range(2):                      # synchronized flood
        sd.feed(rng.randn(8, 2, P).astype(np.float32) * 2.0,
                np.ones((8, 2), bool))
    grown = sd.pool_size
    assert grown > kp0, "flood must grow the pool for this test to bite"
    sd.finish_batch(list(range(8)))         # kills all 8 lanes' tokens

    sd.attach(0, "again")
    scores = (rng.randn(1 + sd.DECAY_QUIET, 2, P) * 2.0).astype(np.float32)
    chunk = np.zeros((8, 2, P), np.float32)
    valid = np.zeros((8, 2), bool)
    for c in range(1 + sd.DECAY_QUIET):
        chunk[0] = scores[c]
        valid[0] = True
        sd.feed(chunk, valid)
    assert sd.pool_size < grown, \
        f"pool never decayed: still {sd.pool_size} after quiet feeds"

    got = sd.finish(0)
    off = PooledViterbiDecoder(fst, tid2pdf, opts).decode(
        scores.reshape(1, -1, P))[0]
    assert got.words == off.words
    if np.isfinite(off.total_cost):
        assert got.total_cost == pytest.approx(off.total_cost, rel=1e-6)


def test_pooled_rebalance_mid_stream(setup):
    """Cross-shard token moves + epoch bridges keep transcripts exact."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(92)
    utts = make_utts(rng, 8, t_range=(9, 13))
    want = offline_pooled(fst, tid2pdf, opts, utts)

    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=8, mesh=mesh)
    c = opts.chunk_frames
    feeding = {}
    for lane, (uid, scores) in enumerate(utts):
        sd.attach(lane, uid)
        feeding[lane] = (uid, scores, 0)

    got = {}
    step = 0
    while feeding:
        chunk = np.zeros((8, c, P), np.float32)
        valid = np.zeros((8, c), bool)
        for lane, (uid, scores, cur) in feeding.items():
            n = min(c, scores.shape[0] - cur)
            chunk[lane, :n] = scores[cur:cur + n]
            valid[lane, :n] = True
            feeding[lane] = (uid, scores, cur + n)
        sd.feed(chunk, valid)
        step += 1
        if step == 2:
            perm = np.roll(np.arange(8), 3)   # rotate across shards
            sd.rebalance(perm)
            feeding = {int(np.nonzero(perm == old)[0][0]): v
                       for old, v in feeding.items()}
        done = [ln for ln, (_, s, cur) in feeding.items()
                if cur >= s.shape[0]]
        for ln, hyp in zip(done, sd.finish_batch(done) if done else []):
            got[feeding.pop(ln)[0]] = hyp

    for uid in want:
        assert got[uid].words == want[uid].words, uid
        if np.isfinite(want[uid].total_cost):
            assert got[uid].total_cost == pytest.approx(
                want[uid].total_cost, rel=1e-5)


def test_pooled_stream_tiny_pool_grows(setup):
    """A per-shard pool of one GROUP must grow, never truncate silently."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(93)
    utts = make_utts(rng, 8, t_range=(6, 10))
    want = offline_pooled(fst, tid2pdf, opts, utts)

    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=16, mesh=mesh,
                                pool_size=128)
    got = StreamSession(sd, P).run(utts)
    assert sd.last_pool_growths > 0
    assert sd.pool_size > 128
    for uid in want:
        assert got[uid].words == want[uid].words, uid


def test_pooled_stream_window_prunes(setup):
    """Records and epoch bridges release as lanes finish."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(94)
    long_scores = (rng.randn(16, P) * 2.0).astype(np.float32)
    short_scores = (rng.randn(4, P) * 2.0).astype(np.float32)
    c = opts.chunk_frames

    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=8, mesh=mesh)
    sd.attach(0, "long")
    cur = 0
    for _ in range(2):
        chunk = np.zeros((8, c, P), np.float32)
        valid = np.zeros((8, c), bool)
        chunk[0] = long_scores[cur:cur + c]
        valid[0] = True
        cur += c
        sd.feed(chunk, valid)
    sd.attach(1, "short")
    chunk = np.zeros((8, c, P), np.float32)
    valid = np.zeros((8, c), bool)
    chunk[0] = long_scores[cur:cur + c]
    chunk[1] = short_scores
    valid[0] = valid[1] = True
    cur += c
    sd.feed(chunk, valid)
    assert sd.resident_record_chunks == 3
    hyp_short = sd.finish(1)
    assert sd.resident_record_chunks == 3   # long lane pins the window

    chunk = np.zeros((8, c, P), np.float32)
    valid = np.zeros((8, c), bool)
    chunk[0] = long_scores[cur:cur + c]
    valid[0] = True
    sd.feed(chunk, valid)
    hyp_long = sd.finish(0)
    assert sd.resident_record_chunks == 0

    dec = PooledViterbiDecoder(fst, tid2pdf, opts)
    assert hyp_short.words == dec.decode(short_scores[None])[0].words
    assert hyp_long.words == dec.decode(long_scores[None])[0].words


def test_pooled_checkpoint_resume(setup, tmp_path):
    """VERDICT r3 weak #5: kill/restore mid-utterance on the virtual mesh
    reproduces identical transcripts — pools, record window, and epoch
    bridges (an attach repack AND a cross-shard rebalance both precede the
    snapshot) all round-trip through the .npz archive."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(93)
    utts = make_utts(rng, 8, t_range=(9, 14))
    c = opts.chunk_frames

    def drive(sd, resume_from=None, ckpt_path=None, ckpt_at_step=None):
        feeding = {}
        got = {}
        if resume_from is None:
            for lane, (uid, scores) in enumerate(utts):
                sd.attach(lane, uid)
                feeding[lane] = (uid, scores, 0)
        else:
            feeding = dict(resume_from)
        step = 0
        while feeding:
            chunk = np.zeros((8, c, P), np.float32)
            valid = np.zeros((8, c), bool)
            for lane, (uid, scores, cur) in feeding.items():
                n = min(c, scores.shape[0] - cur)
                chunk[lane, :n] = scores[cur:cur + n]
                valid[lane, :n] = True
                feeding[lane] = (uid, scores, cur + n)
            sd.feed(chunk, valid)
            step += 1
            if step == 1 and resume_from is None:
                perm = np.roll(np.arange(8), 2)   # epoch: rebalance bridge
                sd.rebalance(perm)
                feeding = {int(np.nonzero(perm == old)[0][0]): v
                           for old, v in feeding.items()}
            if ckpt_at_step is not None and step == ckpt_at_step:
                sd.save_state(ckpt_path)
                return feeding, got
            done = [ln for ln, (_, s, cur) in feeding.items()
                    if cur >= s.shape[0]]
            for ln, hyp in zip(done, sd.finish_batch(done) if done else []):
                got[feeding.pop(ln)[0]] = hyp
        return feeding, got

    # control: uninterrupted run
    sd_c = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=8,
                                  mesh=mesh)
    _, want = drive(sd_c)

    # interrupted run: snapshot after 2 chunks (mid-utterance, past the
    # rebalance epoch), then restore into a FRESH decoder and continue
    ckpt = str(tmp_path / "pooled_stream.npz")
    sd_a = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=8,
                                  mesh=mesh)
    feeding_mid, _ = drive(sd_a, ckpt_path=ckpt, ckpt_at_step=2)
    del sd_a

    sd_b = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=8,
                                  mesh=mesh)
    sd_b.load_state(ckpt)
    assert sd_b.pool_size == sd_b._kp
    _, got = drive(sd_b, resume_from=feeding_mid)

    assert set(got) == set(want)
    for uid in want:
        assert got[uid].words == want[uid].words, uid
        if np.isfinite(want[uid].total_cost):
            assert got[uid].total_cost == pytest.approx(
                want[uid].total_cost, rel=1e-6)


def test_pooled_checkpoint_compat_envelope(setup, tmp_path):
    """A snapshot restores only into a matching decoder (ADVICE r4): a
    different graph or lane count is a loud error, and a lane attached with
    utt_id == "" stays attached across the round trip."""
    from pocketkaldi_tpu.errors import PkRuntimeError
    fst, tid2pdf, opts, mesh = setup
    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=8, mesh=mesh)
    sd.attach(0, "")            # legitimately empty utterance id
    sd.attach(1, "u1")
    ckpt = str(tmp_path / "envelope.npz")
    sd.save_state(ckpt)

    ok = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=8, mesh=mesh)
    ok.load_state(ckpt)
    assert ok.lanes[0].utt_id == ""        # not silently freed
    assert ok.active_lanes() == [0, 1]

    bad_lanes = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=16,
                                       mesh=mesh)
    with pytest.raises(PkRuntimeError, match="num_lanes"):
        bad_lanes.load_state(ckpt)

    other_fst, rng = _other_graph()
    bad_graph = PooledStreamingDecoder(other_fst, tid2pdf, opts,
                                       num_lanes=8, mesh=mesh)
    with pytest.raises(PkRuntimeError, match="different decoding graph"):
        bad_graph.load_state(ckpt)


def _other_graph():
    """A foldable graph that differs from the setup fixture's."""
    from pocketkaldi_tpu.tools.make_fixtures import make_decoding_graph
    for s in range(500, 550):
        rng = np.random.RandomState(s)
        fst = make_decoding_graph(rng, 40, 20, 8)
        if fst.eps_closure is not None:
            return fst, rng
    raise AssertionError("no foldable graph")


def test_sharded_steady_step_has_no_collectives(setup):
    """BASELINE.md scaling gate (VERDICT r3 next #8): the pooled sharded
    steady step must be communication-free — shard-local pools vmapped over
    the mesh ``data`` axis partition with ZERO collectives under GSPMD.  Any
    collective in the compiled HLO would serialize shards on ICI and sink
    the ≥80% scaling-efficiency target.  rebalance() is the one op ALLOWED
    to communicate (cross-shard token exchange) — asserted separately."""
    from pocketkaldi_tpu.decoder.streaming_pooled import (_rebalance_repack,
                                                          _sharded_chunk)
    fst, tid2pdf, opts, mesh = setup
    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=16, mesh=mesh)
    for lane in range(16):
        sd.attach(lane, f"u{lane}")
    sd._flush_attaches()
    c = opts.chunk_frames
    rng = np.random.RandomState(7)
    sc = sd._put(jax.numpy.asarray(
        rng.randn(sd._h, sd._b_loc, c, P).astype(np.float32)))
    vd = sd._put(jax.numpy.ones((sd._h, sd._b_loc, c), bool))

    compiled = _sharded_chunk.lower(sd.pools, sc, vd, sd.graph,
                                    sd.opts).compile()
    hlo = compiled.as_text()
    collectives = [op for op in ("all-reduce", "all-gather",
                                 "collective-permute", "all-to-all",
                                 "reduce-scatter", "collective-broadcast")
                   if op in hlo]
    assert not collectives, \
        f"steady chunk step compiled with collectives: {collectives}"

    # the rebalance repack, by contrast, SHOULD move data across shards
    inv = jax.numpy.asarray(np.roll(np.arange(16), 4).astype(np.int32))
    reb = _rebalance_repack.lower(sd.pools, inv, sd._h, sd._b_loc,
                                  sd._kp).compile().as_text()
    assert any(op in reb for op in ("all-to-all", "collective-permute",
                                    "all-gather", "all-reduce")), \
        "rebalance compiled with no cross-shard movement at all"


def test_pooled_stream_feed_growth_resizes_pool():
    """Mid-stream (feed-time) pool growth must actually RESIZE the pool.

    Regression: the r5 decay refactor left _grow() bumping only self._kp
    while the orphaned pool pad sat dead behind a return — feed retries
    then re-ran the chunk on the unchanged pool, climbed the whole ladder,
    and died on the provable-bound assertion (caught by the bench's
    steady-churn latency rung on the tail-flooding seed-0 pack).

    Attach-path growth pads inside _sharded_reset, so this needs demand
    that grows AFTER attach: a wide graph (beams widen toward max_active
    over frames) behind a small attach-time closure.
    """
    from pocketkaldi_tpu.decoder import PooledViterbiDecoder

    from pocketkaldi_tpu.tools.make_fixtures import make_bench_graph

    rng = np.random.RandomState(301)
    # make_bench_graph: eps chains depth 1 by construction -> always folds
    fst = make_bench_graph(np.random.RandomState(302), 2000, 40, 12)
    assert fst.eps_closure is not None
    tid2pdf = np.random.RandomState(301).randint(0, P, size=41) \
        .astype(np.int32)
    opts = DecoderOptions(max_active=512, expand_factor=8, chunk_frames=4,
                          fold_eps=True, beam=1e9)
    utts = [(f"u{i}", (rng.randn(12, P) * 0.1).astype(np.float32))
            for i in range(4)]
    want = {uid: PooledViterbiDecoder(fst, tid2pdf, opts)
            .decode(scores[None])[0] for uid, scores in utts}

    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=4,
                                pool_size=512)
    for i, (uid, _) in enumerate(utts):
        sd.attach(i, uid)
    chunk = np.stack([s for _, s in utts])            # (4, 12, P)
    growths_after_attach = None
    for lo in range(0, 12, 4):
        sd.feed(chunk[:, lo:lo + 4], np.ones((4, 4), bool))
        if growths_after_attach is None:
            # growth during the FIRST feed may include the attach flush;
            # later feeds' growth is pure feed-path
            growths_after_attach = sd.last_pool_growths
    assert sd.last_pool_growths > 0, \
        "this workload must overflow the 512-slot pool to bite"
    for i, (uid, _) in enumerate(utts):
        got = sd.finish(i)
        assert got.words == want[uid].words, uid
        assert np.isclose(got.total_cost, want[uid].total_cost), uid
