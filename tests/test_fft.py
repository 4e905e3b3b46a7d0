"""FFT correctness — the split-radix FFT's executable spec.

The reference hand-rolls Kaldi's SRFFT (src/srfft.cc) and pins a 128-point
transform against precomputed values (test/srfft_test.cc).  We replace SRFFT
with XLA's batched rfft; these tests pin the same contract — real-input FFT
and the power-spectrum packing the fbank uses — against numpy's reference
FFT in float64.
"""

import numpy as np

import jax.numpy as jnp


def test_rfft_matches_numpy_128():
    rng = np.random.RandomState(70)
    x = rng.randn(128).astype(np.float32)
    got = np.asarray(jnp.fft.rfft(jnp.asarray(x)))
    want = np.fft.rfft(x.astype(np.float64))
    np.testing.assert_allclose(got, want.astype(np.complex64), atol=1e-4)


def test_rfft_batched_512():
    rng = np.random.RandomState(71)
    x = rng.randn(5, 512).astype(np.float32) * 1000
    got = np.asarray(jnp.fft.rfft(jnp.asarray(x), axis=-1))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    rel = np.abs(got - want) / (np.abs(want).max())
    assert rel.max() < 1e-6


def test_power_spectrum_bins():
    """Power spectrum = |X_k|^2 over bins 0..N/2 (fbank.cc:193-211 contract)."""
    rng = np.random.RandomState(72)
    x = rng.randn(512).astype(np.float32)
    spec = np.asarray(jnp.fft.rfft(jnp.asarray(x)))
    power = spec.real ** 2 + spec.imag ** 2
    assert power.shape == (257,)
    want = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    np.testing.assert_allclose(power, want, rtol=1e-4, atol=1e-3)
    # Parseval sanity: sum of powers ≈ N * sum(x²) accounting for rfft halving
    full = np.abs(np.fft.fft(x.astype(np.float64))) ** 2
    assert abs(full.sum() - 512 * (x.astype(np.float64) ** 2).sum()) < 1e-3
