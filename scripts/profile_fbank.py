"""Fbank frontend micro-benchmark: framing + spectrum strategy shootout.

The phase profile (docs/PERFORMANCE.md r3) showed Fbank costing ~520 ms per
B=32 batch — absurd for ~3 GFLOP of work.  Suspects: the (T, 400) strided
index gather in frame_signal (XLA:TPU lowers it as a generic gather, ~13
ns/index like the jnp.repeat pathology) and the batched 512-point rfft
(XLA:TPU FFT is not an MXU op).  Variants:

  A. current: index-gather framing + jnp.fft.rfft
  B. slice framing (3 shifted reshapes, no gather) + rfft
  C. slice framing + DFT-by-matmul (two (400, 257) f32 HIGHEST matmuls on
     the MXU; window/DC/preemph folded into the DFT matrices)

All three are numerically compared against A at f32.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pocketkaldi_tpu.hparams import FbankOptions
from pocketkaldi_tpu.features import fbank as F

OPTS = FbankOptions()
B = 32
N = 80000
T = OPTS.num_frames(N)


def frames_slices(wave, num_frames):
    """(B, N) -> (B, T, 400) with slices+reshape only (no gather).

    shift=160, length=400: frame t = rows t, t+1 and the first 80 samples of
    row t+2 of the (B, rows, 160) reshape.
    """
    shift, length = OPTS.frame_shift, OPTS.frame_length
    rows = num_frames + (length + shift - 1) // shift  # t+2 must exist
    need = rows * shift
    if wave.shape[-1] < need:
        wave = jnp.pad(wave, ((0, 0), (0, need - wave.shape[-1])))
    r = wave[..., :need].reshape(wave.shape[0], rows, shift)
    return jnp.concatenate(
        [r[:, :num_frames], r[:, 1:num_frames + 1],
         r[:, 2:num_frames + 2, :length - 2 * shift]], axis=-1)


def dft_matrices():
    """(400, 257) cos/sin DFT matrices with window/DC/preemph folded in,
    built in float64 on the host."""
    length = OPTS.frame_length
    npad = OPTS.frame_length_padded
    nb = npad // 2 + 1
    w = F.hamming_window(OPTS).astype(np.float64)          # (400,)
    c = OPTS.preemph_coeff
    # linear frame prep: y = diag(w) @ P @ (I - 11^T/L)
    eye = np.eye(length)
    dc = eye - np.ones((length, length)) / length
    pre = eye.copy()
    pre[0, 0] = 1.0 - c
    idx = np.arange(1, length)
    pre[idx, idx - 1] -= c
    a = (w[:, None] * (pre @ dc))                           # (400, 400)
    n = np.arange(length)[:, None]
    k = np.arange(nb)[None, :]
    ang = -2.0 * np.pi * n * k / npad
    mr = a.T @ np.cos(ang)                                  # (400, 257)
    mi = a.T @ np.sin(ang)
    return (jnp.asarray(mr.astype(np.float32)),
            jnp.asarray(mi.astype(np.float32)))


@jax.jit
def variant_a(wave):
    return F.compute_fbank(wave, T, OPTS)


@jax.jit
def variant_b(wave):
    frames = frames_slices(wave, T)
    frames = F.process_frames(frames, OPTS)
    return F.fbank_from_frames(frames, OPTS)


@jax.jit
def variant_c(wave):
    frames = frames_slices(wave, T)
    mr, mi = dft_matrices()
    hp = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, mr, precision=hp)
    im = jnp.matmul(frames, mi, precision=hp)
    power = re * re + im * im
    mel = jnp.asarray(F.mel_banks_matrix(OPTS))
    energies = jnp.matmul(power, mel, preferred_element_type=jnp.float32,
                          precision=hp)
    return jnp.log(jnp.maximum(energies, F.FLT_EPSILON))


def timeit(fn, wave, runs=5):
    fn(wave).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(wave)
    out.block_until_ready()
    return (time.perf_counter() - t0) / runs, out


def main():
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, N).astype(np.float32) * 7000)
    ta, oa = timeit(variant_a, wave)
    tb, ob = timeit(variant_b, wave)
    tc, oc = timeit(variant_c, wave)
    print(f"backend={jax.default_backend()} B={B} T={T}")
    print(f"A gather+rfft:   {ta * 1e3:8.2f} ms")
    print(f"B slices+rfft:   {tb * 1e3:8.2f} ms   "
          f"max|B-A|={float(jnp.max(jnp.abs(ob - oa))):.3e}")
    print(f"C slices+matmul: {tc * 1e3:8.2f} ms   "
          f"max|C-A|={float(jnp.max(jnp.abs(oc - oa))):.3e}")


if __name__ == "__main__":
    main()
