"""Decoder orchestration: chunked device scans + traceback.

The device side (``beam.py``) emits per-frame backpointer generations; this
module runs the chunk loop and unwinds the best path — the analogue of
``Decoder::BestPath``'s OLabel-chain walk (``src/decoder.cc:304-339``)
without any GC: liveness is implicit in the (frame, generation, slot)
indexing.

Two traceback modes (``DecoderOptions.offload_records``):

  * **device mode** (default): records stay in HBM; after the forward pass a
    jitted backward walk (``traceback_chunk``) follows the best slot through
    each chunk, and only the tiny (B, C, G) word planes cross to the host.
    Best when records fit in HBM — host↔device bandwidth is often the
    bottleneck (e.g. tunneled TPUs).
  * **offload mode**: records are fetched per chunk with one-chunk lookahead
    (copy overlaps next-chunk compute) and the traceback runs on the host
    (C++ batched implementation in ``native/``, Python fallback).  Device
    memory stays O(chunk) for arbitrarily long audio (SURVEY.md §5.7).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..fst import Fst
from ..hparams import DecoderOptions
from .beam import (Beam, GraphArrays, best_final, decode_chunk,
                   init_beam_host, resolve_eps_iters, traceback_chunk)


@dataclasses.dataclass
class Hypothesis:
    """1-best result (``Decoder::Hypothesis`` analogue, decoder.h)."""
    words: List[int]
    weight: float           # reported weight (reference-compatible)
    total_cost: float       # cost + final weight (single-counted)
    num_frames: int

    @property
    def empty(self) -> bool:
        return not self.words


class ViterbiDecoder:
    """Batched Viterbi beam-search decoder over one decoding graph."""

    def __init__(self, fst: Fst, tid2pdf: np.ndarray,
                 opts: DecoderOptions = DecoderOptions()):
        self.fst = fst
        self.opts = opts
        self.graph = GraphArrays.build(fst, tid2pdf,
                                       fold_eps=opts.fold_eps)
        # Exact sweep bounds, or a load-time error for graphs with no
        # provable bound (never a silent clamp) — see resolve_eps_iters.
        self.num_eps_iters, self.frame_eps_iters = resolve_eps_iters(
            self.graph, opts)
        # (B,) per-utterance count of frames whose arc expansion overflowed
        # the block budget on the most recent decode() (0 = exact).
        self.last_overflow_frames: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def decode(self, scores: np.ndarray,
               num_frames: Optional[Sequence[int]] = None) -> List[Hypothesis]:
        """Decode a batch.

        scores:     (B, T, P) acoustic-scaled log-likelihoods (am.compute
                    output with acoustic_scale applied), OR a callable
                    ``scores_fn(lo, hi) -> (B, C, P)`` for lazy per-chunk
                    scoring (long audio: the full score matrix — the
                    reference materializes it whole, decodable.cc:13-14 —
                    never exists at once; see Recognizer's chunked scorer)
        num_frames: per-utterance valid frame counts (required for callable
                    scores; default: all T otherwise)
        """
        if callable(scores):
            scores_fn = scores
            if num_frames is None:
                raise ValueError("num_frames required with callable scores")
            t = int(max(num_frames))
            b = len(num_frames)
        else:
            scores = jnp.asarray(scores)
            if scores.ndim == 2:
                scores = scores[None]
            b, t, _ = scores.shape
            scores_fn = lambda lo, hi: scores[:, lo:hi]
        if num_frames is None:
            num_frames = [t] * b
        num_frames = np.asarray(num_frames, dtype=np.int32)

        beam, init_rec = init_beam_host(b, self.graph, self.opts,
                                        self.num_eps_iters)

        chunk = self.opts.chunk_frames
        frame_idx = np.arange(t)
        offload = self.opts.offload_records
        host_recs = []      # offload mode: [(prev, word) numpy]
        device_recs = []    # device mode: [StepRecord on device]
        ov_counts = []      # per-chunk (B,) overflow-frame counts (device)
        pending = None
        for lo in range(0, t, chunk):
            hi = min(lo + chunk, t)
            sl = jnp.asarray(scores_fn(lo, hi))
            valid = jnp.asarray(
                frame_idx[lo:hi][None, :] < num_frames[:, None])
            beam, recs, ov = decode_chunk(beam, sl, valid, self.graph,
                                          self.opts, self.frame_eps_iters)
            ov_counts.append(jnp.sum(ov, axis=-1))
            if offload:
                # One-chunk lookahead: fetch chunk t-1's records while chunk
                # t computes.  np.array (forced copy): on the CPU backend
                # np.asarray is zero-copy and would pin every chunk's device
                # buffer for the whole utterance — offload means OFF device.
                if pending is not None:
                    host_recs.append((np.array(pending.prev),
                                      np.array(pending.word)))
                pending = recs
            else:
                device_recs.append(recs)
        if pending is not None:
            host_recs.append((np.array(pending.prev),
                              np.array(pending.word)))

        slot, total, fin = best_final(beam, self.graph)
        slot_np = np.asarray(slot)
        total = np.asarray(total)
        fin = np.asarray(fin)

        # Surface arc-expansion overflow (dropped arcs degrade accuracy; the
        # fix is a larger DecoderOptions.expand_factor).  Never silent.
        self.last_overflow_frames = np.asarray(
            sum(ov_counts[1:], ov_counts[0])) if ov_counts else \
            np.zeros(b, np.int32)
        if self.last_overflow_frames.any():
            from ..utils import logging as pk_logging
            n_utts = int((self.last_overflow_frames > 0).sum())
            pk_logging.warn(
                "arc-expansion budget overflow on %d/%d utterances (%d "
                "frames total): arcs were dropped; raise "
                "DecoderOptions.expand_factor (current budget %d blocks)",
                n_utts, b, int(self.last_overflow_frames.sum()),
                self.opts.expand_budget)

        if offload or not device_recs:
            all_words = self._traceback_offload(slot_np, host_recs, init_rec,
                                                num_frames, b, t)
        else:
            all_words = self._traceback_device(slot, slot_np, device_recs,
                                               init_rec, b)

        out = []
        for i in range(b):
            if slot_np[i] < 0:
                out.append(Hypothesis([], 0.0, float("inf"),
                                      int(num_frames[i])))
                continue
            weight = float(total[i])
            if self.opts.compat_double_final:
                # BestPath adds the final weight twice (decoder.cc:314,336);
                # reproduce for CLI-output parity.
                weight += float(fin[i])
            out.append(Hypothesis(all_words[i], weight, float(total[i]),
                                  int(num_frames[i])))
        return out

    # ------------------------------------------------------------------
    def _traceback_device(self, slot, slot_np, device_recs, init_rec,
                          b) -> List[List[int]]:
        """Jitted backward walk per chunk; only word planes cross to host."""
        planes = []
        s = jnp.maximum(slot, 0)
        for recs in reversed(device_recs):
            s, words = traceback_chunk(s, recs)
            planes.append(words)
        # Fetch: word planes (B, C, G) + final slot + tiny init records.
        planes_np = [np.asarray(p) for p in reversed(planes)]
        plane = np.concatenate(planes_np, axis=1) if planes_np else \
            np.zeros((b, 0, 1), np.int32)
        s_np = np.asarray(s)
        init_prev = np.asarray(init_rec.prev)
        init_word = np.asarray(init_rec.word)

        out = []
        for i in range(b):
            if slot_np[i] < 0:
                out.append([])
                continue
            # init-closure walk (host; G0 × K is tiny)
            words_init_rev = []
            si = int(s_np[i])
            for gen in range(init_prev.shape[1] - 1, -1, -1):
                w = int(init_word[i, gen, si])
                if w:
                    words_init_rev.append(w)
                si = int(init_prev[i, gen, si])
            flat = plane[i].reshape(-1)
            words = words_init_rev[::-1] + [int(w) for w in flat if w]
            out.append(words)
        return out

    # ------------------------------------------------------------------
    def _traceback_offload(self, slot, host_recs, init_rec, num_frames,
                           b, t) -> List[List[int]]:
        """Host traceback over offloaded records (native C++ or Python)."""
        prev = np.concatenate([r[0] for r in host_recs], axis=1) \
            if host_recs else np.zeros((b, 0, 1, 1), np.int32)
        word = np.concatenate([r[1] for r in host_recs], axis=1) \
            if host_recs else np.zeros((b, 0, 1, 1), np.int32)
        init_prev = np.asarray(init_rec.prev)
        init_word = np.asarray(init_rec.word)

        from ..io import native
        if prev.shape[1] and native.available():
            # Worst case one word per generation (long audio can exceed any
            # fixed cap); +G0 init generations, +1 so count<max never trips.
            max_words = prev.shape[1] * prev.shape[2] + \
                init_prev.shape[1] + 1
            try:
                return native.traceback_batch(prev, word, init_prev,
                                              init_word, slot, num_frames,
                                              max_words=max_words)
            except RuntimeError:
                pass
        return [
            _traceback(int(slot[i]), prev[i], word[i], init_prev[i],
                       init_word[i], int(num_frames[i]))
            if slot[i] >= 0 else []
            for i in range(b)]


def _traceback(slot: int, prev: np.ndarray, word: np.ndarray,
               init_prev: np.ndarray, init_word: np.ndarray,
               num_frames: int) -> List[int]:
    """Walk backpointer generations newest→oldest, collect nonzero words.

    prev/word:            (T, 1+G, K) frame records
    init_prev/init_word:  (G0, K) records of the pre-frame eps closure
    """
    words_rev: List[int] = []
    for tt in range(num_frames - 1, -1, -1):
        for gen in range(prev.shape[1] - 1, -1, -1):
            w = int(word[tt, gen, slot])
            if w:
                words_rev.append(w)
            slot = int(prev[tt, gen, slot])
    for gen in range(init_prev.shape[0] - 1, -1, -1):
        w = int(init_word[gen, slot])
        if w:
            words_rev.append(w)
        slot = int(init_prev[gen, slot])
    return words_rev[::-1]
