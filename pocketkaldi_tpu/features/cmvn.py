"""Online (sliding-window) cepstral mean normalization.

Reference behaviour (``src/cmvn.cc``): for each frame t, accumulate sums over
the trailing window of ``window=600`` frames (``ComputeStats``, cmvn.cc:35-71);
when fewer than 600 frames are in the window, blend in up to
``global_frames=200`` frames' worth of global (training-corpus) stats
(``SmoothStats``, cmvn.cc:73-92):

    count_from_global = min(window - count, global_frames)
    stats += (count_from_global / global_count) * global_stats

then subtract the smoothed mean only (``Apply``, cmvn.cc:94-101).  The stats
vector is ``num_bins`` sums plus the frame count in the last slot.

TPU-native redesign: the window sum is associative, so the strictly sequential
reference recurrence (``cached_frame_ == frame-1`` asserted, cmvn.cc:38)
becomes either

  * a parallel windowed reduction (``lax.reduce_window``) — the default, fully
    frame-parallel; or
  * an exact replay of the reference's float32 round-trip accumulation via
    ``lax.scan`` (``exact=True``) for bit-level debugging parity.

Both are causal in the frame axis, so right-padding an utterance never
perturbs valid frames — which is what makes batched/bucketed use safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..hparams import CmvnOptions


def _smooth_and_apply(feats, sums, counts, global_stats, opts: CmvnOptions):
    """Apply SmoothStats + Apply (cmvn.cc:73-101) given per-frame window sums."""
    dim = feats.shape[-1]
    global_sum = global_stats[..., :dim]
    global_count = global_stats[..., dim]
    count_from_global = jnp.clip(opts.window - counts, 0.0, opts.global_frames)
    scalar = count_from_global / global_count
    smoothed_sum = sums + scalar[..., None] * global_sum
    smoothed_count = counts + scalar * global_count  # == counts + count_from_global
    return feats - smoothed_sum / smoothed_count[..., None]


@partial(jax.jit, static_argnames=("opts",))
def apply_cmvn(feats: jnp.ndarray, global_stats: jnp.ndarray,
               opts: CmvnOptions = CmvnOptions()) -> jnp.ndarray:
    """Normalize (..., T, D) features with global stats (D+1,).

    Parallel mode: windowed sums via ``reduce_window`` over the frame axis.
    """
    if opts.exact:
        return apply_cmvn_exact(feats, global_stats, opts)
    t = feats.shape[-2]
    lead = feats.ndim - 2
    sums = jax.lax.reduce_window(
        feats, 0.0, jax.lax.add,
        window_dimensions=(1,) * lead + (opts.window, 1),
        window_strides=(1,) * (lead + 2),
        padding=[(0, 0)] * lead + [(opts.window - 1, 0), (0, 0)],
    )
    counts = jnp.minimum(jnp.arange(t, dtype=jnp.float32) + 1.0,
                         float(opts.window))
    counts = jnp.broadcast_to(counts, feats.shape[:-1])
    return _smooth_and_apply(feats, sums, counts, global_stats, opts)


@partial(jax.jit, static_argnames=("opts",))
def apply_cmvn_exact(feats: jnp.ndarray, global_stats: jnp.ndarray,
                     opts: CmvnOptions = CmvnOptions(exact=True)) -> jnp.ndarray:
    """Bit-faithful replay of the reference recurrence via ``lax.scan``.

    The reference carries the window sums as float32 between frames
    (``cached_stats_`` is Vector<float>, cmvn.h:31) and recomputes each step in
    double (cmvn.cc:44).  TPUs have no float64, so the in-step arithmetic here
    is float32 — the carried state rounding, which dominates, matches.
    Supports one leading batch axis via vmap below.
    """
    if feats.ndim == 3:
        return jax.vmap(lambda f: apply_cmvn_exact(f, global_stats, opts))(feats)
    t, dim = feats.shape
    shifted = jnp.pad(feats, ((opts.window, 0), (0, 0)))[:t]  # feats[t - window]
    has_prev = (jnp.arange(t) >= opts.window).astype(feats.dtype)

    def step(carry, inp):
        feat, prev, hp = inp
        sums, count = carry
        sums = sums + feat - hp * prev
        count = count + 1.0 - hp
        out_sums, out_count = sums, count
        return (sums, count), (out_sums, out_count)

    init = (jnp.zeros(dim, feats.dtype), jnp.zeros((), feats.dtype))
    _, (sums, counts) = jax.lax.scan(step, init, (feats, shifted, has_prev))
    return _smooth_and_apply(feats, sums, counts, global_stats, opts)
