"""Hyperparameter dataclasses.

The reference hard-codes every decoder/frontend hyperparameter as a
compile-time constant (``fbank.h:7-13``, ``cmvn.h:10-11``, ``decoder.h:45-50``,
``decoder.cc:31``, and the acoustic scale literal at ``pocketkaldi.cc:215``).
Here they are promoted to real configuration with the reference values as
defaults, as SURVEY.md §5.6 prescribes.  All dataclasses are frozen/hashable so
they can be closed over by jitted functions as static configuration.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class FbankOptions:
    """Log-mel filterbank options (reference constants at fbank.h:7-13)."""
    sample_rate: int = 16000          # PK_SAMPLERATE
    frame_shift_ms: float = 10.0      # PK_FRAMESHIFT_MS
    frame_length_ms: float = 25.0     # PK_FRAMELENGTH_MS
    num_bins: int = 40                # PK_FBANK_DIM
    low_freq: float = 20.0            # PK_FBANK_LOWFREQ
    high_freq: float = 8000.0         # PK_FBANK_HIGHFREQ (sample_rate / 2)
    preemph_coeff: float = 0.97       # PK_PREEMPH_COEFF

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * 0.001 * self.frame_shift_ms)

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * 0.001 * self.frame_length_ms)

    @property
    def frame_length_padded(self) -> int:
        """Next power of two ≥ frame_length (fbank.cc:24-33)."""
        n = 1
        while n < self.frame_length:
            n <<= 1
        return n

    def num_frames(self, num_samples: int) -> int:
        """Snip-edges frame count (fbank.cc:35-42)."""
        if num_samples < self.frame_length:
            return 0
        return 1 + (num_samples - self.frame_length) // self.frame_shift


@dataclasses.dataclass(frozen=True)
class CmvnOptions:
    """Online CMVN options (reference constants at cmvn.h:10-11)."""
    window: int = 600                 # PK_ONLINECMVN_WINDOW
    global_frames: int = 200          # PK_ONLINECMVN_GLOBALFRAMES
    # exact=True replays the reference's per-frame float32 round-trip
    # accumulation (cmvn.cc:35-71) with a lax.scan; exact=False computes the
    # same windowed sums with a parallel reduce_window (faster, equal to ~1e-6).
    exact: bool = False


@dataclasses.dataclass(frozen=True)
class DecoderOptions:
    """Beam-search options.

    ``beam``/``max_active`` defaults follow the reference (beam 16.0
    decoder.cc:31; the reference's max-active is 30000, decoder.h:45 — here the
    default beam capacity is 4096, which holds the exact top-K rather than the
    reference's sampled-cutoff estimate, and is configurable up to any size).
    """
    beam: float = 16.0
    max_active: int = 4096            # K: beam capacity (exact top-K)
    # Capacity-escalation ceiling (pooled offline decode): when set above
    # ``max_active``, a chunk in which ANY lane's beam FILLS at the current
    # capacity — the device-checked signal that exact top-K may have
    # truncated tokens a bigger beam would keep — is re-run at the next
    # capacity rung, up to this cap.  The result is then provably identical
    # to decoding every frame at ``max_active_cap`` (a frame whose survivor
    # count stays below its rung was not rank-pruned at all), while quiet
    # frames keep paying only the small-capacity price.  The reference's
    # max-active is a hard 30000 (decoder.h:45) — setting
    # ``max_active_cap=32768`` (the smallest power of two covering it —
    # also a fast sort-length family, docs/PERFORMANCE.md r5) makes exact
    # parity a mechanism instead of a per-pack tuned constant (VERDICT r4
    # next #1).
    # None = fixed-capacity semantics at ``max_active`` (the per-lane
    # decoder's contract, and what the pooled⇔per-lane equivalence tests
    # pin).
    max_active_cap: Optional[int] = None
    expand_factor: int = 8            # E = expand_factor * max_active arc budget
    acoustic_scale: float = 0.1       # pocketkaldi.cc:215
    max_eps_iters: Optional[int] = None  # None → use Fst.eps_depth bound
    chunk_frames: int = 128           # frames per device scan chunk
    # The reference's BestPath adds the final weight into the hypothesis
    # weight twice (decoder.cc:314 adds it into best_cost, decoder.cc:336 adds
    # it again).  True reproduces that reported number for CLI parity.
    compat_double_final: bool = True
    # offload_records=True streams backpointer records to the host each chunk
    # (O(chunk) device memory — long-audio mode).  False keeps them on device
    # and runs the traceback there, fetching only per-chunk word planes —
    # the fast path when records fit in HBM.
    offload_records: bool = False
    # Epsilon-removal at graph build: compose each emitting arc with the
    # min-cost eps closure of its destination so the per-frame decode needs
    # no epsilon sweeps (the reference's ProcessNonemitting work-list,
    # decoder.cc:186-221, disappears from the hot loop).  None = auto (fold
    # when feasible: eps-acyclic closure, ≤2 words per min-cost path, arc
    # blowup ≤ GraphArrays.FOLD_MAX_BLOWUP); True = require; False = never.
    fold_eps: Optional[bool] = None
    # Pooled-beam decode (decoder/pooled.py): ONE token pool shared across
    # batch lanes, so capacity is priced at occupancy instead of
    # B × max_active — the fast way to run burst-capacity beams (large
    # max_active) that typical frames barely use.  Requires an eps-foldable
    # graph and device traceback (incompatible with offload_records).
    pooled: bool = False
    pool_size: Optional[int] = None   # initial pool slots (None = auto)

    @property
    def expand_budget(self) -> int:
        return self.expand_factor * self.max_active
