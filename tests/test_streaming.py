"""Streaming decoder tests: lane lifecycle + parity with offline decode."""

import numpy as np
import pytest

from pocketkaldi_tpu.decoder import ViterbiDecoder
from pocketkaldi_tpu.decoder.streaming import StreamingDecoder
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.tools.make_fixtures import make_decoding_graph


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(60)
    fst = make_decoding_graph(rng, 30, 20, 8)
    tid2pdf = rng.randint(0, 10, size=21).astype(np.int32)
    opts = DecoderOptions(max_active=64, expand_factor=8, chunk_frames=4)
    return fst, tid2pdf, opts


def test_streaming_matches_offline(setup):
    fst, tid2pdf, opts = setup
    rng = np.random.RandomState(61)
    p = 10
    scores = (rng.randn(2, 12, p) * 2.0).astype(np.float32)
    offline = ViterbiDecoder(fst, tid2pdf, opts).decode(scores)

    sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=4)
    sd.attach(0, "a")
    sd.attach(2, "b")
    c = opts.chunk_frames
    for lo in range(0, 12, c):
        chunk = np.zeros((4, c, p), np.float32)
        valid = np.zeros((4, c), bool)
        chunk[0] = scores[0, lo:lo + c]
        chunk[2] = scores[1, lo:lo + c]
        valid[0] = valid[2] = True
        sd.feed(chunk, valid)
    hyp_a = sd.finish(0)
    hyp_b = sd.finish(2)
    assert hyp_a.words == offline[0].words
    assert hyp_a.total_cost == pytest.approx(offline[0].total_cost, rel=1e-5)
    assert hyp_b.words == offline[1].words
    assert hyp_b.total_cost == pytest.approx(offline[1].total_cost, rel=1e-5)
    assert sd.free_lanes() == [0, 1, 2, 3]


def test_lane_reuse_and_stagger(setup):
    """An utterance attached mid-stream on a reused lane decodes correctly."""
    fst, tid2pdf, opts = setup
    rng = np.random.RandomState(62)
    p = 10
    s1 = (rng.randn(4, p) * 2.0).astype(np.float32)
    s2 = (rng.randn(8, p) * 2.0).astype(np.float32)
    offline = ViterbiDecoder(fst, tid2pdf, opts)
    want1 = offline.decode(s1[None])[0]
    want2 = offline.decode(s2[None])[0]

    sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=2)
    c = opts.chunk_frames
    # chunk 1: utt1 on lane 0
    sd.attach(0, "u1")
    chunk = np.zeros((2, c, p), np.float32)
    valid = np.zeros((2, c), bool)
    chunk[0] = s1[:c]
    valid[0] = True
    sd.feed(chunk, valid)
    got1 = sd.finish(0)
    assert got1.words == want1.words

    # utt2 reuses lane 0 for two chunks
    sd.attach(0, "u2")
    for lo in range(0, 8, c):
        chunk = np.zeros((2, c, p), np.float32)
        valid = np.zeros((2, c), bool)
        chunk[0] = s2[lo:lo + c]
        valid[0] = True
        sd.feed(chunk, valid)
    got2 = sd.finish(0)
    assert got2.words == want2.words
    assert got2.total_cost == pytest.approx(want2.total_cost, rel=1e-5)


def test_lane_guard(setup):
    fst, tid2pdf, opts = setup
    sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=2)
    sd.attach(1, "x")
    with pytest.raises(ValueError):
        sd.attach(1, "y")
    with pytest.raises(ValueError):
        sd.finish(0)


def test_checkpoint_resume(setup, tmp_path):
    """Decoding interrupted mid-utterance resumes to identical output."""
    fst, tid2pdf, opts = setup
    rng = np.random.RandomState(63)
    p = 10
    scores = (rng.randn(8, p) * 2.0).astype(np.float32)
    want = ViterbiDecoder(fst, tid2pdf, opts).decode(scores[None])[0]

    c = opts.chunk_frames
    sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=2)
    sd.attach(0, "u")
    chunk = np.zeros((2, c, p), np.float32)
    valid = np.zeros((2, c), bool)
    chunk[0] = scores[:c]
    valid[0] = True
    sd.feed(chunk, valid)
    ckpt = str(tmp_path / "state.npz")
    sd.save_state(ckpt)

    # "crash": build a fresh decoder and restore
    sd2 = StreamingDecoder(fst, tid2pdf, opts, num_lanes=2)
    sd2.load_state(ckpt)
    assert sd2.lanes[0].utt_id == "u"
    chunk[0] = scores[c:]
    sd2.feed(chunk, valid)
    got = sd2.finish(0)
    assert got.words == want.words
    assert got.total_cost == pytest.approx(want.total_cost, rel=1e-5)


def test_checkpoint_archive_contents(setup, tmp_path):
    """The snapshot holds exactly the expected arrays and needs no pickle.

    Regression: save_state once passed ``allow_pickle=True`` into
    ``np.savez_compressed``, which silently saved it as an ARRAY named
    ``allow_pickle`` instead of acting as a flag.
    """
    fst, tid2pdf, opts = setup
    rng = np.random.RandomState(64)
    p = 10
    c = opts.chunk_frames
    sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=2)
    sd.attach(1, "utt-z")
    chunk = (rng.randn(2, c, p) * 2.0).astype(np.float32)
    valid = np.zeros((2, c), bool)
    valid[1] = True
    sd.feed(chunk, valid)
    ckpt = str(tmp_path / "state.npz")
    sd.save_state(ckpt)

    data = np.load(ckpt)  # allow_pickle defaults to False: must still load
    assert set(data.files) == {"beam_state", "beam_cost", "utt_ids",
                               "frames_fed", "attach_chunk", "chunks_fed",
                               "rec_base", "window_prev_0", "window_word_0"}
    assert data["beam_state"].shape == (2, opts.max_active)
    assert data["beam_cost"].dtype == np.float32
    assert data["utt_ids"].dtype.kind == "U"   # fixed-width text, no objects
    assert list(data["utt_ids"]) == ["", "utt-z"]
    assert list(data["frames_fed"]) == [0, c]
    assert int(data["chunks_fed"]) == 1 and int(data["rec_base"]) == 0
    # device-resident record window: one chunk of (B, C, G, K) records
    assert data["window_prev_0"].shape == data["window_word_0"].shape
    assert data["window_prev_0"].shape[:2] == (2, c)
