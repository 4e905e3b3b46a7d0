"""Continuous batched (streaming) decoding — single chip or sharded pod.

The reference decodes one utterance start-to-finish (whole-utterance batch,
no streaming API — SURVEY.md §0, ``src/main.cc:34-46`` is a serial loop).
This module provides the TPU-native production shape (SURVEY.md §5.8, §7
M5): a fixed pool of B decoder *lanes* runs one compiled chunk step forever;
utterances attach to free lanes, stream their score chunks, and detach when
finished — the device program never recompiles and the batch stays full.

Device state per lane: beam (state, cost) plus the per-chunk backpointer
records, which STAY in HBM — the traceback runs on device at finish time and
only tiny per-lane word planes cross to the host (the round-1 design
offloaded full (B, C, G, K) records every chunk, which the repo's own
measurements show is host-link-bound; ``DecoderOptions.offload_records``
keeps that as the opt-in long-stream mode).  Lane resets are a masked
``where`` against the cached init beam — no per-lane dispatch.

Sharding: pass a ``jax.sharding.Mesh`` and every lane-axis array (beam,
scores, records) is placed with the lane axis split over the ``data`` mesh
axis.  The chunk step is lane-elementwise, so GSPMD partitions it with zero
communication; ``rebalance()`` permutes lanes (an all-to-all across shards —
XLA inserts the collective from the sharding annotations), which is the
cross-host lane-rebalancing primitive: move utterances from busy hosts onto
free lanes anywhere in the pod without recompiling.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fst import Fst
from ..hparams import DecoderOptions
from .beam import (Beam, GraphArrays, StepRecord, best_final, decode_chunk,
                   init_beam_batch, resolve_eps_iters, traceback_chunk)
from .decoder import Hypothesis, _traceback


@partial(jax.jit, donate_argnums=(0,))
def _reset_lanes(beam: Beam, init: Beam, mask: jnp.ndarray) -> Beam:
    """Reset masked lanes to the init-closure beam (mask: (B,) bool)."""
    m = mask[:, None]
    return Beam(jnp.where(m, init.state, beam.state),
                jnp.where(m, init.cost, beam.cost))


@partial(jax.jit, donate_argnums=(0,))
def _permute_lanes(tree, perm: jnp.ndarray):
    """Gather-permute the leading lane axis of every leaf (all-to-all when
    the lane axis is sharded)."""
    return jax.tree_util.tree_map(lambda x: jnp.take(x, perm, axis=0), tree)


@dataclasses.dataclass
class _Lane:
    utt_id: Optional[str] = None
    frames_fed: int = 0
    overflow_frames: int = 0   # frames whose arc expansion dropped arcs
    attach_chunk: int = 0      # global chunk index at attach time
    recs: List = dataclasses.field(default_factory=list)  # offload mode only


class StreamingDecoder:
    """Fixed-pool continuous decoder over one decoding graph.

    Usage::

        sd = StreamingDecoder(fst, tid2pdf, opts, num_lanes=64)
        sd.attach(lane, "utt-1")
        sd.feed(scores_chunk, valid)      # (B, C, P), (B, C) — every chunk
        hyp = sd.finish(lane)             # → Hypothesis, frees the lane

    With ``mesh``, lane-axis state is sharded over the mesh's ``data`` axis
    and the same calls drive the whole pod.
    """

    def __init__(self, fst: Fst, tid2pdf: np.ndarray,
                 opts: DecoderOptions = DecoderOptions(),
                 num_lanes: int = 64, mesh=None):
        self.opts = opts
        self.graph = GraphArrays.build(fst, tid2pdf,
                                       fold_eps=opts.fold_eps)
        self.num_eps_iters, self.frame_eps_iters = resolve_eps_iters(
            self.graph, opts)
        self.num_lanes = num_lanes
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS
            if num_lanes % mesh.shape[DATA_AXIS]:
                raise ValueError(
                    f"num_lanes={num_lanes} not divisible by the data axis "
                    f"({mesh.shape[DATA_AXIS]} shards)")
            self._lane_sharding = lambda ndim: NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
        else:
            self._lane_sharding = None

        self._init_beam, init_rec = init_beam_batch(
            num_lanes, self.graph, opts, self.num_eps_iters)
        if self._lane_sharding:
            self._init_beam = jax.device_put(
                self._init_beam, self._lane_sharding(2))
        self._init_rec = (np.asarray(init_rec.prev),
                          np.asarray(init_rec.word))
        self.beam = Beam(self._init_beam.state.copy(),
                         self._init_beam.cost.copy())
        self.lanes: List[_Lane] = [_Lane() for _ in range(num_lanes)]
        # Device-resident records: one StepRecord per fed chunk, oldest
        # first; _rec_base = global chunk index of _records[0].
        self._records: List[StepRecord] = []
        self._rec_base = 0
        self.chunks_fed = 0

    # ------------------------------------------------------------------
    def _put(self, x, ndim):
        if self._lane_sharding is None:
            return jnp.asarray(x)
        return jax.device_put(jnp.asarray(x), self._lane_sharding(ndim))

    def free_lanes(self) -> List[int]:
        return [i for i, l in enumerate(self.lanes) if l.utt_id is None]

    def active_lanes(self) -> List[int]:
        return [i for i, l in enumerate(self.lanes) if l.utt_id is not None]

    def attach(self, lane: int, utt_id: str) -> None:
        """Bind an utterance to a lane and reset its beam to the start state."""
        if self.lanes[lane].utt_id is not None:
            raise ValueError(f"lane {lane} is busy with "
                             f"{self.lanes[lane].utt_id}")
        self.lanes[lane] = _Lane(utt_id=utt_id, attach_chunk=self.chunks_fed)
        mask = np.zeros(self.num_lanes, bool)
        mask[lane] = True
        self.beam = _reset_lanes(self.beam, self._init_beam,
                                 self._put(mask, 1))

    def feed(self, scores: np.ndarray, valid: np.ndarray) -> None:
        """Advance every lane by one chunk.

        scores: (B, C, P) acoustic-scaled log-likelihoods; valid: (B, C)
        bool — False frames are no-ops for that lane (idle or shorter
        utterance).
        """
        valid = np.asarray(valid, dtype=bool)
        self.beam, recs, ov = decode_chunk(
            self.beam, self._put(scores, 3), self._put(valid, 2),
            self.graph, self.opts, self.frame_eps_iters)
        if self.opts.offload_records:
            # forced copy: zero-copy views would pin the device buffers
            prev = np.array(recs.prev)
            word = np.array(recs.word)
        else:
            self._records.append(recs)
        ov = np.asarray(ov)
        for i, lane in enumerate(self.lanes):
            n = int(valid[i].sum())
            if lane.utt_id is None or n == 0:
                continue
            if self.opts.offload_records:
                lane.recs.append((prev[i, :n], word[i, :n]))
            lane.frames_fed += n
            lane.overflow_frames += int(ov[i].sum())
        self.chunks_fed += 1

    # ------------------------------------------------------------------
    def finish(self, lane: int) -> Hypothesis:
        """Finalize a lane's utterance, free the lane, return the 1-best."""
        return self.finish_batch([lane])[0]

    def finish_batch(self, lanes: Sequence[int]) -> List[Hypothesis]:
        """Finalize several lanes with ONE device traceback walk.

        The walk runs once over all pool lanes (it is batched anyway); only
        the finishing lanes' word planes — (C, G) ints per chunk per lane —
        cross to the host.
        """
        for i in lanes:
            if self.lanes[i].utt_id is None:
                raise ValueError(f"lane {i} is idle")
        slot, total, fin = best_final(self.beam, self.graph)
        slot_np = np.asarray(slot)
        total_np = np.asarray(total)
        fin_np = np.asarray(fin)

        if self.opts.offload_records:
            words_of = self._words_offload(lanes, slot_np)
        else:
            words_of = self._words_device(lanes, slot)

        out = []
        for i in lanes:
            l = self.lanes[i]
            if slot_np[i] < 0 or l.frames_fed == 0:
                hyp = Hypothesis([], 0.0, float("inf"), l.frames_fed)
            else:
                weight = float(total_np[i]) + (
                    float(fin_np[i]) if self.opts.compat_double_final
                    else 0.0)
                hyp = Hypothesis(words_of[i], weight, float(total_np[i]),
                                 l.frames_fed)
            self.lanes[i] = _Lane(attach_chunk=self.chunks_fed)
            out.append(hyp)
        self._prune_records()
        return out

    def _words_device(self, lanes: Sequence[int],
                      slot) -> Dict[int, List[int]]:
        """Device traceback over the resident record window.

        Walks the whole pool's slots chunk by chunk (the walk is batched);
        a finishing lane's slot is FROZEN at its attach boundary — walking
        it further would follow the records of the lane's previous occupant
        — and the frozen slot seeds the init-closure walk.
        """
        lane_attach = {i: self.lanes[i].attach_chunk for i in lanes}
        for i, a in lane_attach.items():
            if self.lanes[i].frames_fed and a < self._rec_base:
                raise RuntimeError(
                    f"record window lost lane {i}'s chunks (attach {a} < "
                    f"base {self._rec_base}); pruning invariant broken")
        oldest = min(lane_attach.values(), default=self.chunks_fed)
        s = jnp.maximum(slot, 0)
        attach_slots = {}                          # lane → device slot vec
        for i, a in lane_attach.items():
            if a >= self.chunks_fed:               # attached, nothing fed
                attach_slots[i] = s
        planes: List[Tuple[int, np.ndarray]] = []  # (global chunk idx, words)
        lane_idx = np.asarray(lanes)
        for ci in range(len(self._records) - 1,
                        max(oldest - self._rec_base, 0) - 1, -1):
            gci = self._rec_base + ci
            s, words = traceback_chunk(s, self._records[ci])
            # fetch only the finishing lanes' planes: (C, G) ints each
            planes.append((gci, np.asarray(words[lane_idx])))
            for i, a in lane_attach.items():
                if a == gci:                       # slot entering chunk a =
                    attach_slots[i] = s            # the post-attach beam

        out: Dict[int, List[int]] = {}
        init_prev, init_word = self._init_rec
        for j, i in enumerate(lanes):
            attach = lane_attach[i]
            words: List[int] = []
            for gci, plane in reversed(planes):   # oldest chunk first
                if gci < attach:
                    continue
                words.extend(int(w) for w in plane[j].reshape(-1) if w)
            # init-closure words, seeded by the attach-boundary slot
            si = int(np.asarray(attach_slots[i])[i])
            init_rev = []
            for gen in range(init_prev.shape[1] - 1, -1, -1):
                w = int(init_word[i, gen, si])
                if w:
                    init_rev.append(w)
                si = int(init_prev[i, gen, si])
            out[i] = init_rev[::-1] + words
        return out

    def _words_offload(self, lanes: Sequence[int],
                       slot_np: np.ndarray) -> Dict[int, List[int]]:
        out: Dict[int, List[int]] = {}
        for i in lanes:
            l = self.lanes[i]
            if slot_np[i] < 0 or not l.recs:
                out[i] = []
                continue
            prev = np.concatenate([r[0] for r in l.recs], axis=0)
            word = np.concatenate([r[1] for r in l.recs], axis=0)
            out[i] = _traceback(int(slot_np[i]), prev, word,
                                self._init_rec[0][i], self._init_rec[1][i],
                                l.frames_fed)
        return out

    def _prune_records(self) -> None:
        """Drop record chunks no active lane can reach in a traceback."""
        active = [l.attach_chunk for l in self.lanes if l.utt_id is not None]
        horizon = min(active) if active else self.chunks_fed
        while self._records and self._rec_base < horizon:
            self._records.pop(0)
            self._rec_base += 1

    @property
    def resident_record_chunks(self) -> int:
        return len(self._records)

    # ------------------------------------------------------------------
    def rebalance(self, perm: Sequence[int]) -> None:
        """Move utterances between lanes: new lane i continues old lane
        ``perm[i]`` (a permutation).  Beam state AND the resident record
        window are gather-permuted on device — with a sharded lane axis XLA
        lowers this to the cross-shard all-to-all, which is exactly the
        SURVEY §5.8 "cross-host beam-state exchange".  Host-side lane
        metadata follows.  O(window) device bandwidth; intended for
        utterance-boundary load balancing, not per-chunk use.
        """
        perm = np.asarray(perm, dtype=np.int32)
        if sorted(perm.tolist()) != list(range(self.num_lanes)):
            raise ValueError("perm must be a permutation of all lanes")
        p = self._put(perm, 1)
        self.beam = _permute_lanes(self.beam, p)
        self._records = [_permute_lanes(r, p) for r in self._records]
        self.lanes = [self.lanes[int(j)] for j in perm]

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
            "attach_chunk": np.asarray(
                [l.attach_chunk for l in self.lanes], dtype=np.int64),
            "chunks_fed": np.asarray(self.chunks_fed, dtype=np.int64),
            "rec_base": np.asarray(self._rec_base, dtype=np.int64),
        }
        for ci, rec in enumerate(self._records):
            payload[f"window_prev_{ci}"] = np.asarray(rec.prev)
            payload[f"window_word_{ci}"] = np.asarray(rec.word)
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
        self.beam = Beam(self._put(data["beam_state"], 2),
                         self._put(data["beam_cost"], 2))
        utt_ids = data["utt_ids"]
        frames = data["frames_fed"]
        attach = data.get("attach_chunk",
                          np.zeros(self.num_lanes, np.int64))
        self.chunks_fed = int(data.get("chunks_fed", 0))
        self._rec_base = int(data.get("rec_base", 0))
        self._records = []
        ci = 0
        while f"window_prev_{ci}" in data:
            self._records.append(StepRecord(
                self._put(data[f"window_prev_{ci}"], 4),
                self._put(data[f"window_word_{ci}"], 4)))
            ci += 1
        self.lanes = []
        for i in range(self.num_lanes):
            lane = _Lane(utt_id=str(utt_ids[i]) or None,
                         frames_fed=int(frames[i]),
                         attach_chunk=int(attach[i]))
            if f"recs_prev_{i}" in data:
                lane.recs = [(data[f"recs_prev_{i}"],
                              data[f"recs_word_{i}"])]
            self.lanes.append(lane)


# ---------------------------------------------------------------------------
# Host-side feeder: keep the lane pool full from a stream of utterances.
# ---------------------------------------------------------------------------

class StreamSession:
    """Drives a :class:`StreamingDecoder` from an utterance queue.

    Pulls (utt_id, scores (T, P)) items, keeps every lane busy, feeds one
    fixed-shape chunk per step, finishes lanes as their frames run out, and
    returns {utt_id: Hypothesis}.  This is the M5 scp-feeder loop: the
    device program is ONE compiled chunk step regardless of utterance
    lengths, arrival order, or pool size.
    """

    def __init__(self, sd: StreamingDecoder, num_pdfs: int):
        self.sd = sd
        self.num_pdfs = num_pdfs

    def run(self, utterances: Iterable[Tuple[str, np.ndarray]]
            ) -> Dict[str, Hypothesis]:
        sd = self.sd
        b, c, p = sd.num_lanes, sd.opts.chunk_frames, self.num_pdfs
        it: Iterator[Tuple[str, np.ndarray]] = iter(utterances)
        feeding: Dict[int, Tuple[str, np.ndarray, int]] = {}
        results: Dict[str, Hypothesis] = {}
        exhausted = False

        while True:
            # attach new utterances onto free lanes
            if not exhausted:
                for lane in sd.free_lanes():
                    nxt = next(it, None)
                    if nxt is None:
                        exhausted = True
                        break
                    utt_id, scores = nxt
                    sd.attach(lane, utt_id)
                    feeding[lane] = (utt_id, np.asarray(scores), 0)
            if not feeding:
                break

            chunk = np.zeros((b, c, p), np.float32)
            valid = np.zeros((b, c), bool)
            for lane, (utt_id, scores, cur) in feeding.items():
                n = min(c, scores.shape[0] - cur)
                chunk[lane, :n] = scores[cur:cur + n]
                valid[lane, :n] = True
                feeding[lane] = (utt_id, scores, cur + n)
            sd.feed(chunk, valid)

            done = [lane for lane, (_, scores, cur) in feeding.items()
                    if cur >= scores.shape[0]]
            if done:
                hyps = sd.finish_batch(done)
                for lane, hyp in zip(done, hyps):
                    results[feeding.pop(lane)[0]] = hyp
        return results
