"""Batched log-mel filterbank frontend.

Reference behaviour: ``Fbank::Compute`` (``src/fbank.cc:267-292``) runs a
sequential per-frame chain — extract window, remove DC, pre-emphasize, Hamming
window, 512-point split-radix real FFT (``src/srfft.cc``), power spectrum, 40
sparse mel dot products, floor, log (``fbank.cc:219-246``).

TPU-native redesign (SURVEY.md §7): all frames of all utterances at once.

  * Frame extraction is a strided gather — ``(B, T, 400)`` in one op.
  * DC removal / pre-emphasis / Hamming are fused elementwise ops on that
    tensor (XLA fuses them into the gather's consumer).
  * The split-radix FFT becomes a single batched ``jnp.fft.rfft`` over the
    padded 512-sample axis — mathematically identical to the reference's
    SRFFT + post-twiddle (``srfft.cc:371-461``), handled by XLA's FFT.
  * The 40 sparse triangular mel filters (``fbank.cc:103-163``) become one
    dense (257, 40) matrix so the mel reduction is a single MXU matmul.

Everything is shape-static under jit: the wave is padded to a bucket length
and the valid frame count travels alongside as data.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hparams import FbankOptions

# The reference's 2*pi literal (fbank.cc:18-20); reused for bit-parity of the
# Hamming window.
M_2PI = 6.28318530718

# FLT_EPSILON floor applied before log (fbank.cc:244)
FLT_EPSILON = float(np.finfo(np.float32).eps)


def mel_scale(freq):
    """mel = 1127 ln(1 + f/700)  (fbank.h:30-32)."""
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


@lru_cache(maxsize=8)
def mel_banks_matrix(opts: FbankOptions) -> np.ndarray:
    """Dense (num_fft_bins+1, num_bins) mel weight matrix.

    Reproduces ``Melbanks::Melbanks`` (fbank.cc:103-163): triangular weights
    evaluated at each FFT bin's center frequency, nonzero only strictly inside
    (left_mel, right_mel).  The reference stores per-bin sparse ranges; we
    zero-pad to a dense matrix so the mel reduction is one matmul.  Note the
    reference iterates fft bins [0, N/2) — the Nyquist bin N/2 never enters any
    filter, so its matrix row is zero.
    """
    n_padded = opts.frame_length_padded
    num_fft_bins = n_padded // 2
    fft_bin_width = opts.sample_rate / n_padded
    mel_low = mel_scale(opts.low_freq)
    mel_high = mel_scale(opts.high_freq)
    mel_delta = (mel_high - mel_low) / (opts.num_bins + 1)

    bin_freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    bin_mels = mel_scale(bin_freqs)  # (num_fft_bins,)

    left = mel_low + np.arange(opts.num_bins, dtype=np.float64) * mel_delta
    center = left + mel_delta
    right = center + mel_delta

    m = bin_mels[:, None]  # (F, 1)
    up = (m - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - m) / (right - center)[None, :]
    weights = np.where(m <= center[None, :], up, down)
    inside = (m > left[None, :]) & (m < right[None, :])
    weights = np.where(inside, weights, 0.0)

    out = np.zeros((num_fft_bins + 1, opts.num_bins), dtype=np.float32)
    out[:num_fft_bins] = weights.astype(np.float32)
    return out


@lru_cache(maxsize=8)
def hamming_window(opts: FbankOptions) -> np.ndarray:
    """0.54 - 0.46 cos(2πi/(L-1))  (fbank.cc:249-256)."""
    length = opts.frame_length
    a = M_2PI / (length - 1)
    i = np.arange(length, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(a * i)).astype(np.float32)


def frame_signal(wave: jnp.ndarray, num_frames: int,
                 opts: FbankOptions) -> jnp.ndarray:
    """Strided gather of analysis windows: (..., N) → (..., num_frames, frame_length).

    ``num_frames`` must be static (host-derived from the padded length); frames
    that would read past the wave are clamped to the last sample and masked by
    the caller via its valid-frame count.
    """
    shift, length = opts.frame_shift, opts.frame_length
    starts = jnp.arange(num_frames) * shift
    idx = starts[:, None] + jnp.arange(length)[None, :]
    idx = jnp.minimum(idx, wave.shape[-1] - 1)
    return wave[..., idx]


def process_frames(frames: jnp.ndarray, opts: FbankOptions) -> jnp.ndarray:
    """DC removal + pre-emphasis + Hamming (``ProcessWindow``, fbank.cc:44-69).

    Vectorized over leading axes; the reference's backward in-place loop uses
    each sample's *original* predecessor, i.e. y[i] = x[i] - c·x[i-1] (i>0) and
    y[0] = x[0]·(1-c), applied after de-meaning.
    """
    coeff = opts.preemph_coeff
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - coeff * prev
    window = jnp.asarray(hamming_window(opts))
    return frames * window


def fbank_from_frames(frames: jnp.ndarray, opts: FbankOptions) -> jnp.ndarray:
    """Windowed frames (..., T, frame_length) → log-mel (..., T, num_bins)."""
    n_padded = opts.frame_length_padded
    pad = n_padded - opts.frame_length
    padded = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
    spectrum = jnp.fft.rfft(padded, axis=-1)       # (..., T, n_padded/2+1)
    power = jnp.square(spectrum.real) + jnp.square(spectrum.imag)
    power = power.astype(jnp.float32)
    mel = jnp.asarray(mel_banks_matrix(opts))      # (n_padded/2+1, num_bins)
    # HIGHEST precision: on TPU the MXU's default reduced-precision f32 pass
    # costs ~1e-3 absolute here, blowing the 1e-5 Kaldi parity gate.  The
    # matmul is tiny (257×40), so full f32 is free.
    energies = jnp.matmul(power, mel, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    energies = jnp.maximum(energies, FLT_EPSILON)  # ApplyFloor (fbank.cc:244)
    return jnp.log(energies)


@partial(jax.jit, static_argnames=("num_frames", "opts"))
def compute_fbank(wave: jnp.ndarray, num_frames: int,
                  opts: FbankOptions = FbankOptions()) -> jnp.ndarray:
    """End-to-end fbank for one (possibly padded) wave: (N,) → (num_frames, bins).

    Batched use: ``jax.vmap(lambda w: compute_fbank(w, T, opts))`` or call with
    a leading batch axis — every op here broadcasts over leading axes.
    """
    # int16 input is accepted and upcast on device: the wave is 16-bit PCM
    # at the source, so callers may ship half the bytes over the (tunneled,
    # latency-heavy) host->device link; int16 -> float32 is exact.
    wave = wave.astype(jnp.float32)
    frames = frame_signal(wave, num_frames, opts)
    frames = process_frames(frames, opts)
    return fbank_from_frames(frames, opts)


def compute_fbank_np(wave: np.ndarray,
                     opts: FbankOptions = FbankOptions()) -> np.ndarray:
    """Host convenience wrapper: exact frame count from the true wave length."""
    num_frames = opts.num_frames(int(wave.shape[-1]))
    if num_frames == 0:
        return np.zeros((0, opts.num_bins), dtype=np.float32)
    return np.asarray(compute_fbank(jnp.asarray(wave, dtype=jnp.float32),
                                    num_frames, opts))
