"""M5 gates: sharded streaming decode on the virtual 8-device CPU mesh.

SURVEY.md §5.8 / §7 M5 (net-new vs the reference — its only "batch" is a
serial scp loop, src/main.cc:34-46): a big fixed lane pool sharded over the
``data`` mesh axis, records resident on device, lane rebalancing as a device
permutation, and a host feeder that keeps lanes full.  Gates:

  * transcripts identical to the offline batched decoder,
  * a 512-lane pool streams a staggered utterance mix correctly,
  * transcripts invariant to lane placement and to mid-stream rebalancing,
  * the record window prunes as utterances finish (device memory bounded).
"""

import numpy as np
import pytest

import jax

from pocketkaldi_tpu.decoder import ViterbiDecoder
from pocketkaldi_tpu.decoder.streaming import StreamingDecoder, StreamSession
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.parallel.mesh import make_mesh
from pocketkaldi_tpu.tools.make_fixtures import make_decoding_graph

P = 10  # pdfs


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(80)
    fst = make_decoding_graph(rng, 30, 20, 8)
    tid2pdf = rng.randint(0, P, size=21).astype(np.int32)
    opts = DecoderOptions(max_active=64, expand_factor=8, chunk_frames=4)
    mesh = make_mesh(jax.devices()[:8], model_parallel=1)
    return fst, tid2pdf, opts, mesh


def make_utts(rng, n, t_range=(5, 18)):
    utts = []
    for i in range(n):
        t = rng.randint(*t_range)
        utts.append((f"utt{i:04d}",
                     (rng.randn(t, P) * 2.0).astype(np.float32)))
    return utts


def offline_hyps(fst, tid2pdf, opts, utts):
    dec = ViterbiDecoder(fst, tid2pdf, opts)
    out = {}
    for uid, scores in utts:
        out[uid] = dec.decode(scores[None])[0]
    return out


def test_sharded_session_matches_offline(setup):
    """512 sharded lanes, staggered lengths → offline-identical transcripts."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(81)
    utts = make_utts(rng, 40)
    want = offline_hyps(fst, tid2pdf, opts, utts)

    sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=512, mesh=mesh)
    got = StreamSession(sd, P).run(utts)

    assert set(got) == set(want)
    for uid in want:
        assert got[uid].words == want[uid].words, uid
        assert got[uid].total_cost == pytest.approx(want[uid].total_cost,
                                                    rel=1e-5)
    # all lanes free and the record window fully pruned at drain
    assert len(sd.free_lanes()) == 512
    assert sd.resident_record_chunks == 0


def test_lane_placement_invariance(setup):
    """The same utterance decodes identically on any lane / any mix."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(82)
    utts = make_utts(rng, 6, t_range=(8, 12))
    want = offline_hyps(fst, tid2pdf, opts, utts)

    for order_seed in (0, 1):
        perm = np.random.RandomState(order_seed).permutation(len(utts))
        sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=16, mesh=mesh)
        got = StreamSession(sd, P).run([utts[i] for i in perm])
        for uid in want:
            assert got[uid].words == want[uid].words, (order_seed, uid)


def test_rebalance_mid_stream(setup):
    """A lane permutation mid-utterance (the cross-shard beam-state
    exchange) must not change any transcript."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(83)
    utts = make_utts(rng, 8, t_range=(9, 13))
    want = offline_hyps(fst, tid2pdf, opts, utts)

    sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=8, mesh=mesh)
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
            # mid-stream rotation across shards (1 lane per device here)
            perm = np.roll(np.arange(8), 3)
            sd.rebalance(perm)
            feeding = {int(np.nonzero(perm == old)[0][0]): v
                       for old, v in feeding.items()}
        done = [ln for ln, (_, s, cur) in feeding.items()
                if cur >= s.shape[0]]
        for ln, hyp in zip(done, sd.finish_batch(done) if done else []):
            got[feeding.pop(ln)[0]] = hyp

    for uid in want:
        assert got[uid].words == want[uid].words, uid
        assert got[uid].total_cost == pytest.approx(want[uid].total_cost,
                                                    rel=1e-5)


def test_record_window_prunes(setup):
    """Finished lanes release record chunks (device memory is O(window))."""
    fst, tid2pdf, opts, mesh = setup
    rng = np.random.RandomState(84)
    long_scores = (rng.randn(16, P) * 2.0).astype(np.float32)  # 4 chunks
    short_scores = (rng.randn(4, P) * 2.0).astype(np.float32)

    sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=8, mesh=mesh)
    c = opts.chunk_frames

    sd.attach(0, "long")
    cur_l = 0
    # feed 2 chunks of the long utterance
    for _ in range(2):
        chunk = np.zeros((8, c, P), np.float32)
        valid = np.zeros((8, c), bool)
        chunk[0] = long_scores[cur_l:cur_l + c]
        valid[0] = True
        cur_l += c
        sd.feed(chunk, valid)
    # short utterance rides chunks 2..2 and finishes; long keeps going
    sd.attach(1, "short")
    chunk = np.zeros((8, c, P), np.float32)
    valid = np.zeros((8, c), bool)
    chunk[0] = long_scores[cur_l:cur_l + c]
    chunk[1] = short_scores
    valid[0] = valid[1] = True
    cur_l += c
    sd.feed(chunk, valid)
    assert sd.resident_record_chunks == 3
    hyp_short = sd.finish(1)
    # long lane attached at chunk 0 → nothing prunable yet
    assert sd.resident_record_chunks == 3

    # finish the long one; window must drain completely
    chunk = np.zeros((8, c, P), np.float32)
    valid = np.zeros((8, c), bool)
    chunk[0] = long_scores[cur_l:cur_l + c]
    valid[0] = True
    sd.feed(chunk, valid)
    hyp_long = sd.finish(0)
    assert sd.resident_record_chunks == 0

    dec = ViterbiDecoder(fst, tid2pdf, opts)
    assert hyp_short.words == dec.decode(short_scores[None])[0].words
    assert hyp_long.words == dec.decode(long_scores[None])[0].words
