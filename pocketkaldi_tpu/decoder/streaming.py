"""Continuous batched (streaming) decoding.

The reference decodes one utterance start-to-finish (whole-utterance batch,
no streaming API — SURVEY.md §0).  This module provides the TPU-native
production shape: a fixed pool of B decoder *lanes* runs one compiled chunk
step forever; utterances attach to free lanes, stream their score chunks, and
detach when finished — so the device program never recompiles and the batch
stays full (the M5 "1024 concurrent streaming utterances" design, SURVEY.md
§7).

Device state per lane: beam (state, cost).  Host state per lane: accumulated
backpointer records (offloaded each chunk) and frame count.  Lane resets are
a masked ``where`` against the cached init beam — no per-lane dispatch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fst import Fst
from ..hparams import DecoderOptions
from .beam import (Beam, GraphArrays, best_final, decode_chunk,
                   init_beam_batch, resolve_eps_iters)
from .decoder import Hypothesis, _traceback


@partial(jax.jit, donate_argnums=(0,))
def _reset_lanes(beam: Beam, init: Beam, mask: jnp.ndarray) -> Beam:
    """Reset masked lanes to the init-closure beam (mask: (B,) bool)."""
    m = mask[:, None]
    return Beam(jnp.where(m, init.state, beam.state),
                jnp.where(m, init.cost, beam.cost))


@dataclasses.dataclass
class _Lane:
    utt_id: Optional[str] = None
    frames_fed: int = 0
    overflow_frames: int = 0   # frames whose arc expansion dropped arcs
    recs: List = dataclasses.field(default_factory=list)  # [(prev, word)] np


class StreamingDecoder:
    """Fixed-pool continuous decoder over one decoding graph.

    Usage::

        sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=64)
        sd.attach(lane, "utt-1")
        sd.feed(scores_chunk, valid)      # (B, C, P), (B, C) — every chunk
        hyp = sd.finish(lane)             # → Hypothesis, frees the lane
    """

    def __init__(self, fst: Fst, tid2pdf: np.ndarray,
                 opts: DecoderOptions = DecoderOptions(),
                 num_lanes: int = 64):
        self.opts = opts
        self.graph = GraphArrays.build(fst, tid2pdf,
                                       fold_eps=opts.fold_eps)
        self.num_eps_iters, self.frame_eps_iters = resolve_eps_iters(
            self.graph, opts)
        self.num_lanes = num_lanes
        self._init_beam, self._init_rec = init_beam_batch(
            num_lanes, self.graph, opts, self.num_eps_iters)
        self._init_rec = (np.asarray(self._init_rec.prev),
                          np.asarray(self._init_rec.word))
        self.beam = Beam(self._init_beam.state.copy(),
                         self._init_beam.cost.copy())
        self.lanes: List[_Lane] = [_Lane() for _ in range(num_lanes)]

    # ------------------------------------------------------------------
    def free_lanes(self) -> List[int]:
        return [i for i, l in enumerate(self.lanes) if l.utt_id is None]

    def attach(self, lane: int, utt_id: str) -> None:
        """Bind an utterance to a lane and reset its beam to the start state."""
        if self.lanes[lane].utt_id is not None:
            raise ValueError(f"lane {lane} is busy with "
                             f"{self.lanes[lane].utt_id}")
        self.lanes[lane] = _Lane(utt_id=utt_id)
        mask = np.zeros(self.num_lanes, bool)
        mask[lane] = True
        self.beam = _reset_lanes(self.beam, self._init_beam,
                                 jnp.asarray(mask))

    def feed(self, scores: np.ndarray, valid: np.ndarray) -> None:
        """Advance every lane by one chunk.

        scores: (B, C, P) acoustic-scaled log-likelihoods; valid: (B, C)
        bool — False frames are no-ops for that lane (idle or shorter
        utterance).
        """
        scores = jnp.asarray(scores)
        valid = np.asarray(valid, dtype=bool)
        self.beam, recs, ov = decode_chunk(self.beam, scores,
                                           jnp.asarray(valid), self.graph,
                                           self.opts, self.frame_eps_iters)
        prev = np.asarray(recs.prev)
        word = np.asarray(recs.word)
        ov = np.asarray(ov)
        for i, lane in enumerate(self.lanes):
            n = int(valid[i].sum())
            if lane.utt_id is None or n == 0:
                continue
            lane.recs.append((prev[i, :n], word[i, :n]))
            lane.frames_fed += n
            lane.overflow_frames += int(ov[i].sum())

    # ------------------------------------------------------------------
    # Checkpoint / resume (net-new vs the reference, SURVEY.md §5.4: an
    # interrupted reference run restarts utterances from scratch; here the
    # full decoding state snapshots to one .npz).
    # ------------------------------------------------------------------
    def save_state(self, path: str) -> None:
        """Snapshot beam state + per-lane progress/records to ``path``."""
        payload = {
            "beam_state": np.asarray(self.beam.state),
            "beam_cost": np.asarray(self.beam.cost),
            # fixed-width unicode (no object dtype → no pickle in the archive)
            "utt_ids": np.asarray(
                [l.utt_id if l.utt_id is not None else ""
                 for l in self.lanes]),
            "frames_fed": np.asarray([l.frames_fed for l in self.lanes],
                                     dtype=np.int64),
        }
        for i, lane in enumerate(self.lanes):
            if lane.recs:
                payload[f"recs_prev_{i}"] = np.concatenate(
                    [r[0] for r in lane.recs], axis=0)
                payload[f"recs_word_{i}"] = np.concatenate(
                    [r[1] for r in lane.recs], axis=0)
        np.savez_compressed(path, **payload)

    def load_state(self, path: str) -> None:
        """Restore a snapshot taken by :meth:`save_state`."""
        data = np.load(path)
        self.beam = Beam(jnp.asarray(data["beam_state"]),
                         jnp.asarray(data["beam_cost"]))
        utt_ids = data["utt_ids"]
        frames = data["frames_fed"]
        self.lanes = []
        for i in range(self.num_lanes):
            lane = _Lane(utt_id=str(utt_ids[i]) or None,
                         frames_fed=int(frames[i]))
            if f"recs_prev_{i}" in data:
                lane.recs = [(data[f"recs_prev_{i}"],
                              data[f"recs_word_{i}"])]
            self.lanes.append(lane)

    def finish(self, lane: int) -> Hypothesis:
        """Finalize a lane's utterance, free the lane, return the 1-best."""
        l = self.lanes[lane]
        if l.utt_id is None:
            raise ValueError(f"lane {lane} is idle")
        slot, total, fin = best_final(self.beam, self.graph)
        slot_i = int(np.asarray(slot)[lane])
        total_i = float(np.asarray(total)[lane])
        fin_i = float(np.asarray(fin)[lane])

        if slot_i < 0 or l.frames_fed == 0:
            hyp = Hypothesis([], 0.0, float("inf"), l.frames_fed)
        else:
            prev = np.concatenate([r[0] for r in l.recs], axis=0)
            word = np.concatenate([r[1] for r in l.recs], axis=0)
            words = _traceback(slot_i, prev, word, self._init_rec[0][lane],
                               self._init_rec[1][lane], l.frames_fed)
            weight = total_i + (fin_i if self.opts.compat_double_final
                                else 0.0)
            hyp = Hypothesis(words, weight, total_i, l.frames_fed)
        self.lanes[lane] = _Lane()
        return hyp
