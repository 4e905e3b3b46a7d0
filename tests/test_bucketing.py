"""Bucketing tests: ladder shape, order preservation, transcript invariance."""

import numpy as np
import pytest

from pocketkaldi_tpu import Recognizer
from pocketkaldi_tpu.parallel.bucketing import (bucket_length, decode_bucketed,
                                                make_buckets)
from pocketkaldi_tpu.tools.make_fixtures import write_fixture_model


def test_bucket_length_ladder():
    assert bucket_length(100) == 16000
    assert bucket_length(16000) == 16000
    assert bucket_length(16001) == 24000
    assert bucket_length(24001) == 36000
    # monotone and covering
    prev = 0
    for n in [5, 16000, 20000, 50000, 200000]:
        b = bucket_length(n)
        assert b >= n
        assert b >= prev
        prev = b


def test_make_buckets_split_and_order():
    lengths = [100, 17000, 200, 18000, 40000]
    buckets = make_buckets(lengths, max_batch=2)
    covered = sorted(i for _, idxs in buckets for i in idxs)
    assert covered == [0, 1, 2, 3, 4]
    for padded, idxs in buckets:
        assert len(idxs) <= 2
        for i in idxs:
            assert lengths[i] <= padded


@pytest.mark.full
def test_decode_bucketed_matches_per_utterance(tmp_path):
    m = write_fixture_model(str(tmp_path), seed=9)
    rec = Recognizer.load(m.conf_path)
    rng = np.random.RandomState(80)

    def wavegen(sec):
        n = int(16000 * sec)
        t = np.arange(n) / 16000.0
        return ((np.sin(2 * np.pi * 300 * t) + rng.randn(n) * 0.1) * 8000
                ).astype(np.float32)

    waves = [wavegen(s) for s in (0.5, 1.4, 0.6)]
    got = decode_bucketed(rec, waves, max_batch=2)
    for w, u in zip(waves, got):
        solo = rec.process_batch([w])[0]
        assert u.hyp == solo.hyp
        assert u.loglikelihood_per_frame == pytest.approx(
            solo.loglikelihood_per_frame, rel=1e-5)
