"""Decoder orchestration: chunked device scans + host-side traceback.

The device side (``beam.py``) emits per-frame backpointer generations; this
module runs the chunk loop, accumulates the (small) records on the host, and
unwinds the best path — the analogue of ``Decoder::BestPath``'s OLabel-chain
walk (``src/decoder.cc:304-339``) without any GC: liveness is implicit in the
(frame, generation, slot) indexing.

Memory is O(chunk) on device (SURVEY.md §5.7's long-audio requirement): each
chunk's records are fetched to host numpy before the next chunk runs, so
utterance length is unbounded.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..fst import Fst
from ..hparams import DecoderOptions
from .beam import (Beam, GraphArrays, best_final, decode_chunk,
                   init_beam_batch)


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
        self.graph = GraphArrays.build(fst, tid2pdf)
        if opts.max_eps_iters is not None:
            self.num_eps_iters = opts.max_eps_iters
        else:
            # Bellman-Ford over the eps DAG: d sweeps finalize all shortest
            # eps-paths of ≤ d edges; d = measured longest chain (Fst.eps_depth)
            self.num_eps_iters = max(1, min(self.graph.eps_depth, 16))

    # ------------------------------------------------------------------
    def decode(self, scores: np.ndarray,
               num_frames: Optional[Sequence[int]] = None) -> List[Hypothesis]:
        """Decode a batch.

        scores:     (B, T, P) acoustic-scaled log-likelihoods (am.compute
                    output with acoustic_scale applied)
        num_frames: per-utterance valid frame counts (default: all T)
        """
        scores = jnp.asarray(scores)
        if scores.ndim == 2:
            scores = scores[None]
        b, t, _ = scores.shape
        if num_frames is None:
            num_frames = [t] * b
        num_frames = np.asarray(num_frames, dtype=np.int32)

        beam, init_rec = init_beam_batch(b, self.graph, self.opts,
                                         self.num_eps_iters)
        host_recs = [(np.asarray(init_rec.prev), np.asarray(init_rec.word))]

        chunk = self.opts.chunk_frames
        frame_idx = np.arange(t)
        pending = None
        for lo in range(0, t, chunk):
            hi = min(lo + chunk, t)
            sl = scores[:, lo:hi]
            valid = jnp.asarray(
                frame_idx[lo:hi][None, :] < num_frames[:, None])
            beam, recs = decode_chunk(beam, sl, valid, self.graph,
                                      self.opts, self.num_eps_iters)
            # One-chunk lookahead: fetch chunk t-1's records while chunk t
            # computes, keeping device memory O(chunk) and overlapping the
            # device→host copy with compute.
            if pending is not None:
                host_recs.append((np.asarray(pending.prev),
                                  np.asarray(pending.word)))
            pending = recs
        if pending is not None:
            host_recs.append((np.asarray(pending.prev),
                              np.asarray(pending.word)))

        slot, total, fin = best_final(beam, self.graph)
        slot = np.asarray(slot)
        total = np.asarray(total)
        fin = np.asarray(fin)

        # Concatenate frame records: (B, T, 1+G, K)
        prev = np.concatenate([r[0] for r in host_recs[1:]], axis=1) \
            if t else np.zeros((b, 0, 1, 1), np.int32)
        word = np.concatenate([r[1] for r in host_recs[1:]], axis=1) \
            if t else np.zeros((b, 0, 1, 1), np.int32)
        init_prev, init_word = host_recs[0]

        all_words = self._traceback_batch(slot, prev, word, init_prev,
                                          init_word, num_frames)
        out = []
        for i in range(b):
            if slot[i] < 0:
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

    def _traceback_batch(self, slot, prev, word, init_prev, init_word,
                         num_frames) -> List[List[int]]:
        """Native batched traceback when available; Python fallback."""
        from ..io import native
        if prev.shape[1] and native.available():
            try:
                return native.traceback_batch(prev, word, init_prev,
                                              init_word, slot, num_frames)
            except RuntimeError:
                pass
        return [
            _traceback(int(slot[i]), prev[i], word[i], init_prev[i],
                       init_word[i], int(num_frames[i]))
            if slot[i] >= 0 else []
            for i in range(slot.shape[0])]


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
