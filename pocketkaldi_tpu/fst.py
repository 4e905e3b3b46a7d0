"""Immutable HCLG decoding graph in flat CSR arrays.

Binary format (``pk::fst_0``, reference reader ``src/fst.cc:29-92``, writer
``tool/convert_fstfmt.py:55-73``):

    32-byte zero-padded magic "pk::fst_0"
    int32 section_size
    int32 n_states, int32 n_arcs, int32 start_state
    float32 final[n_states]          (+inf for non-final states)
    int32 first_arc_idx[n_states]    (-1 for states without out-going arcs)
    Arc[n_arcs]                      Arc = {int32 next_state, int32 ilabel,
                                            int32 olabel, float32 weight}
    (arcs sorted by source state; ilabel 0 = epsilon, ilabels = transition-ids)

The reference walks this with an ``ArcIterator`` + ``CountArcs`` forward scan
(``fst.cc:94-129``).  For the TPU the same data becomes a proper CSR row-pointer
array plus struct-of-arrays arc columns, which is exactly the layout a
vectorized token-passing decoder gathers from.

Graph analysis performed at load (all host-side numpy, cached):

  * ``row_ptr``       — first_arc_idx densified so ``row_ptr[s]..row_ptr[s+1]``
                        is state ``s``'s arc range even for arc-less states.
  * ``max_out_degree``/degree histogram — sizes the decoder's arc-expansion
                        budget.
  * ``eps_depth``     — an upper bound on epsilon-chain length, bounding the
                        number of epsilon-closure sweeps the decoder needs
                        (replaces the reference's unbounded work-list DFS,
                        ``decoder.cc:186-221``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from functools import cached_property
from typing import Optional

import numpy as np

from .errors import CorruptionError
from .io.binary import Reader

FST_SECTION = b"pk::fst_0"
ARC_DTYPE = np.dtype([("next_state", "<i4"), ("ilabel", "<i4"),
                      ("olabel", "<i4"), ("weight", "<f4")])


@dataclass
class Fst:
    """Decoding graph as struct-of-arrays (host numpy; device copies on demand)."""

    start_state: int
    final: np.ndarray        # (S,) float32, +inf = non-final
    first_arc: np.ndarray    # (S,) int32, -1 = no arcs (as stored on disk)
    next_state: np.ndarray   # (A,) int32
    ilabel: np.ndarray       # (A,) int32
    olabel: np.ndarray       # (A,) int32
    weight: np.ndarray       # (A,) float32

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------
    @classmethod
    def read(cls, filename: str) -> "Fst":
        with Reader.open(filename) as r:
            raw_magic = r.read_bytes(32)
            magic = raw_magic.split(b"\0", 1)[0]
            if magic != FST_SECTION:
                raise CorruptionError(
                    f"section_name == '{FST_SECTION.decode()}' expected, but "
                    f"'{magic!r}' found: {filename}")
            section_size = r.read_int32()
            n_states = r.read_int32()
            n_arcs = r.read_int32()
            start_state = r.read_int32()
            expected = 12 + n_states * 8 + n_arcs * 16
            if expected != section_size:
                raise CorruptionError(
                    f"section_size == {expected} expected, but {section_size} "
                    f"found: {filename}")
            final = np.frombuffer(r.read_bytes(n_states * 4), dtype="<f4").copy()
            first_arc = np.frombuffer(r.read_bytes(n_states * 4), dtype="<i4").copy()
            arcs = np.frombuffer(r.read_bytes(n_arcs * 16), dtype=ARC_DTYPE)
        return cls(
            start_state=start_state,
            final=final,
            first_arc=first_arc,
            next_state=arcs["next_state"].copy(),
            ilabel=arcs["ilabel"].copy(),
            olabel=arcs["olabel"].copy(),
            weight=arcs["weight"].copy(),
        )

    def write(self, filename: str) -> None:
        """Serialize back to ``pk::fst_0`` (fixture/tool support)."""
        arcs = np.empty(self.num_arcs, dtype=ARC_DTYPE)
        arcs["next_state"] = self.next_state
        arcs["ilabel"] = self.ilabel
        arcs["olabel"] = self.olabel
        arcs["weight"] = self.weight
        with open(filename, "wb") as fd:
            fd.write(FST_SECTION.ljust(32, b"\0"))
            section_size = 12 + self.num_states * 8 + self.num_arcs * 16
            fd.write(struct.pack("<iiii", section_size, self.num_states,
                                 self.num_arcs, self.start_state))
            fd.write(self.final.astype("<f4").tobytes())
            fd.write(self.first_arc.astype("<i4").tobytes())
            fd.write(arcs.tobytes())

    @classmethod
    def from_arrays(cls, num_states: int, start_state: int,
                    src: np.ndarray, dst: np.ndarray, ilabel: np.ndarray,
                    olabel: np.ndarray, weight: np.ndarray,
                    final: np.ndarray) -> "Fst":
        """Vectorized build from flat arc columns (converter/bench path).

        ``final`` is the dense (S,) float array (+inf = non-final).  Arcs
        are stably sorted by source state; ``first_arc`` is densified the
        same way ``convert_fstfmt.py:44-52`` does (-1 for arc-less states).
        """
        src = np.asarray(src, dtype=np.int64)
        order = np.argsort(src, kind="stable")
        src = src[order]
        first_arc = np.full(num_states, -1, dtype=np.int32)
        uniq, first_pos = np.unique(src, return_index=True)
        first_arc[uniq] = first_pos.astype(np.int32)
        return cls(
            start_state=start_state,
            final=np.asarray(final, dtype=np.float32),
            first_arc=first_arc,
            next_state=np.asarray(dst, dtype=np.int32)[order],
            ilabel=np.asarray(ilabel, dtype=np.int32)[order],
            olabel=np.asarray(olabel, dtype=np.int32)[order],
            weight=np.asarray(weight, dtype=np.float32)[order],
        )

    @classmethod
    def from_arcs(cls, num_states: int, start_state: int,
                  arcs: "list[tuple]", finals: "dict[int, float]") -> "Fst":
        """Build from (src, dst, ilabel, olabel, weight) tuples (tool/test path)."""
        arcs = sorted(arcs, key=lambda a: a[0])
        first_arc = np.full(num_states, -1, dtype=np.int32)
        for idx, arc in enumerate(arcs):
            if first_arc[arc[0]] == -1:
                first_arc[arc[0]] = idx
        final = np.full(num_states, np.inf, dtype=np.float32)
        for state, w in finals.items():
            final[state] = w
        return cls(
            start_state=start_state,
            final=final,
            first_arc=first_arc,
            next_state=np.array([a[1] for a in arcs], dtype=np.int32),
            ilabel=np.array([a[2] for a in arcs], dtype=np.int32),
            olabel=np.array([a[3] for a in arcs], dtype=np.int32),
            weight=np.array([a[4] for a in arcs], dtype=np.float32),
        )

    # ------------------------------------------------------------------
    # Shape / analysis
    # ------------------------------------------------------------------
    @property
    def num_states(self) -> int:
        return int(self.final.shape[0])

    @property
    def num_arcs(self) -> int:
        return int(self.next_state.shape[0])

    @cached_property
    def row_ptr(self) -> np.ndarray:
        """(S+1,) CSR row pointers: arcs of state s are row_ptr[s]:row_ptr[s+1].

        Densifies ``first_arc`` by back-filling -1 entries with the next
        state's pointer (the semantics ``CountArcs`` computes per query,
        fst.cc:94-110, done once instead).
        """
        ptr = np.empty(self.num_states + 1, dtype=np.int32)
        ptr[-1] = self.num_arcs
        fa = self.first_arc.astype(np.int64)
        fill = np.where(fa < 0, np.iinfo(np.int64).max, fa)
        # back-accumulate minimum so empty states inherit the next pointer
        rev_min = np.minimum.accumulate(fill[::-1])[::-1]
        ptr[:-1] = np.minimum(rev_min, self.num_arcs).astype(np.int32)
        return ptr

    @cached_property
    def out_degree(self) -> np.ndarray:
        return np.diff(self.row_ptr)

    @property
    def max_out_degree(self) -> int:
        return int(self.out_degree.max()) if self.num_states else 0

    @cached_property
    def arc_source(self) -> np.ndarray:
        """(A,) source state of each arc (inverse of row_ptr)."""
        src = np.zeros(self.num_arcs, dtype=np.int32)
        starts = self.row_ptr[:-1]
        counts = self.out_degree
        src[starts[counts > 0]] = 1
        src = np.cumsum(src) - 1
        # states with arcs, in order; map ordinal back to state id
        states_with_arcs = np.nonzero(counts > 0)[0].astype(np.int32)
        return states_with_arcs[src] if states_with_arcs.size else src

    @cached_property
    def eps_row_ptr_and_arcs(self):
        """CSR view restricted to epsilon (ilabel==0) arcs.

        Returns (eps_row_ptr (S+1,), eps_arc_index (Ae,)) where eps_arc_index
        maps into the full arc arrays.
        """
        is_eps = self.ilabel == 0
        eps_idx = np.nonzero(is_eps)[0].astype(np.int32)
        counts = np.bincount(self.arc_source[eps_idx],
                             minlength=self.num_states) if eps_idx.size else \
            np.zeros(self.num_states, dtype=np.int64)
        ptr = np.zeros(self.num_states + 1, dtype=np.int32)
        np.cumsum(counts, out=ptr[1:])
        return ptr, eps_idx

    @cached_property
    def emit_row_ptr_and_arcs(self):
        """CSR view restricted to emitting (ilabel!=0) arcs."""
        is_emit = self.ilabel != 0
        emit_idx = np.nonzero(is_emit)[0].astype(np.int32)
        counts = np.bincount(self.arc_source[emit_idx],
                             minlength=self.num_states) if emit_idx.size else \
            np.zeros(self.num_states, dtype=np.int64)
        ptr = np.zeros(self.num_states + 1, dtype=np.int32)
        np.cumsum(counts, out=ptr[1:])
        return ptr, emit_idx

    # Longest-eps-chain measurement cap; hitting it means the eps sub-graph
    # has a cycle (or a pathologically deep chain) and NO sweep count can be
    # proven sufficient — eps_depth_bounded goes False and the decoder
    # refuses to clamp silently (decoder/beam.py resolve_eps_iters).
    EPS_DEPTH_CAP = 256

    @cached_property
    def _eps_depth_info(self):
        """(depth, bounded): longest path in the eps DAG + convergence flag.

        Computed by iterated relaxation over epsilon arcs only (self-loops
        never extend chains).  ``bounded`` is False when the relaxation has
        not converged within EPS_DEPTH_CAP sweeps — the reference instead
        runs its work-list to fixpoint at decode time (decoder.cc:186-221);
        here the bound must exist statically, so an unbounded measurement is
        surfaced rather than clamped.
        """
        is_eps = self.ilabel == 0
        src = self.arc_source[is_eps]
        dst = self.next_state[is_eps]
        keep = src != dst  # ignore self-loops
        src, dst = src[keep], dst[keep]
        if src.size == 0:
            return 0, True
        depth = np.zeros(self.num_states, dtype=np.int32)
        for it in range(self.EPS_DEPTH_CAP):
            cand = depth[src] + 1
            new = depth.copy()
            np.maximum.at(new, dst, cand)
            if np.array_equal(new, depth):
                return it, True
            depth = new
        return self.EPS_DEPTH_CAP, False

    @property
    def eps_depth(self) -> int:
        return self._eps_depth_info[0]

    @property
    def eps_depth_bounded(self) -> bool:
        return self._eps_depth_info[1]

    @cached_property
    def eps_closure(self) -> Optional[dict]:
        """Min-cost epsilon closure: best eps-path from s to every t ≠ s.

        Returns a dict of flat arrays {src, dst, cost, w1, w2, nwords} plus
        a scalar "sweeps" (extension iterations to fixpoint — every min-cost
        eps path has ≤ sweeps+1 edges, which bounds the relaxation sweeps a
        decoder needs for ANY token set, cyclic graphs included), where
        (w1, w2) are the first two word labels emitted along the min-cost
        path (0 = none) and nwords counts them — or ``None`` when the
        closure is unusable for arc folding: an improving epsilon cycle, a
        min-cost path with more than two words, relaxation not converging
        within 64 sweeps, or pair-count blowup.

        Host-side numpy, computed once per graph.  Only the min-cost path
        per (s, t) matters for Viterbi (any other eps path loses at token
        dedup), so folding these paths into emitting arcs preserves decode
        semantics exactly (see decoder/beam.py fold_eps).
        """
        is_eps = self.ilabel == 0
        src = self.arc_source[is_eps]
        dst = self.next_state[is_eps]
        w = self.weight[is_eps].astype(np.float64)
        ol = self.olabel[is_eps]
        keep = src != dst                      # self-loops never improve
        src, dst, w, ol = src[keep], dst[keep], w[keep], ol[keep]
        if src.size == 0:
            return {k: np.zeros(0, np.int32) for k in
                    ("src", "dst", "w1", "w2", "nwords")} | \
                {"cost": np.zeros(0, np.float32), "sweeps": 0}

        max_pairs = 16 * src.size + 1024
        order = np.argsort(src, kind="stable")
        bsrc, bdst, bw, bol = src[order], dst[order], w[order], ol[order]

        # paths: structure-of-arrays keyed by (psrc, pdst)
        psrc, pdst, pcost = src.copy(), dst.copy(), w.copy()
        pw1 = ol.astype(np.int32)
        pw2 = np.zeros_like(pw1)
        pn = (ol != 0).astype(np.int32)

        def dedup(ps, pd, pc, p1, p2, pnw):
            key = ps.astype(np.int64) * self.num_states + pd
            o = np.lexsort((pc, key))
            key, ps, pd, pc, p1, p2, pnw = (a[o] for a in
                                            (key, ps, pd, pc, p1, p2, pnw))
            first = np.concatenate([[True], key[1:] != key[:-1]])
            return ps[first], pd[first], pc[first], p1[first], p2[first], \
                pnw[first]

        psrc, pdst, pcost, pw1, pw2, pn = dedup(psrc, pdst, pcost, pw1, pw2,
                                                pn)
        sweeps = 0
        for sweeps in range(1, 65):
            # extend every current path by one eps arc out of its endpoint
            lo = np.searchsorted(bsrc, pdst, side="left")
            hi = np.searchsorted(bsrc, pdst, side="right")
            cnt = hi - lo
            if cnt.sum() == 0:
                break
            rep = np.repeat(np.arange(psrc.size), cnt)
            flat = (np.repeat(lo, cnt) +
                    (np.arange(rep.size) -
                     np.repeat(np.cumsum(cnt) - cnt, cnt)))
            esrc = psrc[rep]
            edst = bdst[flat]
            ecost = pcost[rep] + bw[flat]
            eol = bol[flat]
            has = eol != 0
            en = pn[rep] + has.astype(np.int32)
            ew1 = np.where((pn[rep] == 0) & has, eol, pw1[rep]).astype(np.int32)
            ew2 = np.where((pn[rep] == 1) & has, eol, pw2[rep]).astype(np.int32)
            keep = esrc != edst                 # closing a cycle: drop
            esrc, edst, ecost, ew1, ew2, en = (a[keep] for a in
                                               (esrc, edst, ecost, ew1, ew2,
                                                en))
            ns, nd, nc, n1, n2, nn = dedup(
                np.concatenate([psrc, esrc]), np.concatenate([pdst, edst]),
                np.concatenate([pcost, ecost]), np.concatenate([pw1, ew1]),
                np.concatenate([pw2, ew2]), np.concatenate([pn, en]))
            if nn.size > max_pairs:
                return None
            # Exact fixpoint test: Bellman-Ford over nonnegative float64
            # weights converges exactly, and a tolerance here (np.allclose
            # originally) could freeze a still-improving sub-tolerance path
            # into the folded arc weights — diverging folded vs swept costs.
            if (ns.size == psrc.size and np.array_equal(ns, psrc)
                    and np.array_equal(nd, pdst)
                    and np.array_equal(nc, pcost)):
                break
            psrc, pdst, pcost, pw1, pw2, pn = ns, nd, nc, n1, n2, nn
        else:
            return None                         # no fixpoint in 64 sweeps

        if pn.size and int(pn.max()) > 2:
            return None                         # min-cost path needs >2 words
        return {"src": psrc.astype(np.int32), "dst": pdst.astype(np.int32),
                "cost": pcost.astype(np.float32), "w1": pw1, "w2": pw2,
                "nwords": pn, "sweeps": sweeps}

    def final_weight(self, state: int) -> float:
        return float(self.final[state])

    def arcs_of(self, state: int):
        """Yield (next_state, ilabel, olabel, weight) — debugging/oracle path."""
        lo, hi = self.row_ptr[state], self.row_ptr[state + 1]
        for i in range(lo, hi):
            yield (int(self.next_state[i]), int(self.ilabel[i]),
                   int(self.olabel[i]), float(self.weight[i]))
