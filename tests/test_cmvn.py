"""Online CMVN golden parity (mirrors reference test/cmvn_test.cc:33-82)."""

import os

import numpy as np

from pocketkaldi_tpu.features.cmvn import CmvnOptions, apply_cmvn, apply_cmvn_exact
from pocketkaldi_tpu.features.fbank import compute_fbank_np
from pocketkaldi_tpu.io import binary, wav


def _golden(path):
    with open(path) as fd:
        return np.array([float(t) for t in fd.read().split()], dtype=np.float32)


def test_cmvn_golden_parity(reference_data_dir):
    samples = wav.read_16k_pcm(os.path.join(reference_data_dir,
                                            "en-us-hello.wav"))
    stats = binary.read_vector_file(os.path.join(reference_data_dir,
                                                 "cmvn_stats.bin"))
    golden = _golden(os.path.join(reference_data_dir,
                                  "fbankcmvnmat_en-us-hello.wav.txt"))
    feats = compute_fbank_np(samples)
    for exact in (False, True):
        out = np.asarray(apply_cmvn(feats, stats,
                                    CmvnOptions(exact=exact)))
        diff = np.abs(out.reshape(-1) - golden)
        # The golden dump itself sits ~3.5e-5 from an exact float64
        # transcription of cmvn.cc (the reference's own test masks this with
        # a one-sided compare, cmvn_test.cc:74).  5e-5 two-sided is therefore
        # the achievable gate — stricter than the reference's effective one.
        assert diff.max() < 5e-5, f"exact={exact}: max abs diff {diff.max():.3e}"


def test_modes_agree_long():
    """Parallel reduce_window and exact scan agree on long sequences."""
    rng = np.random.RandomState(3)
    t = 1500  # crosses the 600-frame window boundary several times
    feats = rng.randn(t, 40).astype(np.float32) * 3 + 10
    stats = np.concatenate([rng.randn(40).astype(np.float32) * 100 + 2000,
                            [220.0]]).astype(np.float32)
    fast = np.asarray(apply_cmvn(feats, stats))
    exact = np.asarray(apply_cmvn_exact(feats, stats))
    np.testing.assert_allclose(fast, exact, atol=2e-4)


def test_numpy_oracle_small():
    """Differential test vs a direct numpy transcription of cmvn.cc:35-101."""
    rng = np.random.RandomState(4)
    t, d, window, gframes = 50, 8, 20, 5
    feats = rng.randn(t, d).astype(np.float32)
    stats = np.concatenate([rng.randn(d), [7.0]]).astype(np.float32)
    opts = CmvnOptions(window=window, global_frames=gframes)

    expected = np.empty_like(feats)
    run = np.zeros(d + 1, dtype=np.float64)
    for f in range(t):
        run[:d] += feats[f]
        run[d] += 1
        if f - window >= 0:
            run[:d] -= feats[f - window]
            run[d] -= 1
        s = run.copy()
        count = s[d]
        if count < window:
            cfg = min(window - count, gframes)
            s += (cfg / stats[d]) * stats
        expected[f] = feats[f] - s[:d] / s[d]

    for fn in (apply_cmvn, apply_cmvn_exact):
        out = np.asarray(fn(feats, stats, opts))
        np.testing.assert_allclose(out, expected, atol=1e-5)


def test_batched_matches_single():
    rng = np.random.RandomState(5)
    feats = rng.randn(4, 100, 40).astype(np.float32)
    stats = np.concatenate([rng.randn(40), [300.0]]).astype(np.float32)
    batched = np.asarray(apply_cmvn(feats, stats))
    for b in range(4):
        single = np.asarray(apply_cmvn(feats[b], stats))
        np.testing.assert_allclose(batched[b], single, atol=1e-6)


def test_causality_padding_safe():
    """Right-padding must not change valid frames (bucketed batching)."""
    rng = np.random.RandomState(6)
    feats = rng.randn(80, 40).astype(np.float32)
    stats = np.concatenate([rng.randn(40), [250.0]]).astype(np.float32)
    base = np.asarray(apply_cmvn(feats, stats))
    padded = np.pad(feats, ((0, 40), (0, 0)))
    out = np.asarray(apply_cmvn(padded, stats))
    np.testing.assert_allclose(out[:80], base, atol=1e-6)
