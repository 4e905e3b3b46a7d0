"""Vectorized Viterbi beam search over an HCLG graph — device side.

This replaces the reference's pointer-chasing token-passing loop
(``src/decoder.cc``) with array programs that batch, jit, and shard:

  reference structure                      TPU-native structure
  ------------------------------------------------------------------
  Token{state,cost,olabel*} in Pool        beam = fixed-K arrays (state, cost)
  HashTable<state, tok_idx> dedup          sort by (state, cost) + first-of-run
    (decoder.cc:99-130)                      mask → min-cost per state
  GetCutoff: 200 LCG samples + nth_element exact beam pruning + exact top-K
    (decoder.cc:132-182)                     (lax.top_k) — *more* deterministic
  ProcessEmitting per-token arc loop       CSR arc expansion: prefix-sum +
    (decoder.cc:224-301)                     searchsorted gather, fixed budget E
  ProcessNonemitting work-list DFS         bounded epsilon sweeps (lax.scan)
    (decoder.cc:186-221)                     to the graph's eps-depth fixpoint
  OLabel GC'd cons-lists (pool.h:164-220)  per-generation backpointer records
                                             (prev_slot, word), traced back on
                                             host — no GC needed

Shapes are static everywhere: K = beam capacity (max-active), E = arc
expansion budget, G = epsilon sweeps per frame.  Empty beam slots carry
state = -1 / cost = +inf.  A frame step emits 1+G backpointer "generations";
generation g maps slot k of generation g to (prev_slot in generation g-1,
word emitted on the traversed arc).  Batch = a leading vmap axis; the graph
arrays are closed over and replicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fst import Fst
from ..hparams import DecoderOptions

INT_MAX = np.iinfo(np.int32).max


class Beam(NamedTuple):
    """Active tokens: state (K,) int32 (-1 = empty), cost (K,) float32."""
    state: jnp.ndarray
    cost: jnp.ndarray


class StepRecord(NamedTuple):
    """Backpointers for the generations produced by one frame step.

    prev: (1+G, K) int32 — slot in the previous generation
    word: (1+G, K) int32 — olabel emitted on the arc into this token (0 = none)
    """
    prev: jnp.ndarray
    word: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GraphArrays:
    """Device-resident CSR views of the decoding graph.

    Emitting arcs carry a precomputed pdf id (tid2pdf applied at load —
    replaces the per-arc ``TransitionIdToPdfId`` lookup, decodable.cc:24-31).
    """
    emit_ptr: jnp.ndarray     # (S+1,)
    emit_next: jnp.ndarray    # (Ae,)
    emit_pdf: jnp.ndarray     # (Ae,)
    emit_olabel: jnp.ndarray  # (Ae,)
    emit_weight: jnp.ndarray  # (Ae,)
    eps_ptr: jnp.ndarray      # (S+1,)
    eps_next: jnp.ndarray     # (An,)
    eps_olabel: jnp.ndarray   # (An,)
    eps_weight: jnp.ndarray   # (An,)
    final: jnp.ndarray        # (S,)
    start_state: int
    eps_depth: int
    emit_max_degree: int      # max emitting out-degree over states
    eps_max_degree: int       # max epsilon out-degree over states

    @classmethod
    def build(cls, fst: Fst, tid2pdf: np.ndarray) -> "GraphArrays":
        emit_ptr, emit_idx = fst.emit_row_ptr_and_arcs
        eps_ptr, eps_idx = fst.eps_row_ptr_and_arcs
        emit_ilabel = fst.ilabel[emit_idx]
        tid2pdf = np.asarray(tid2pdf, dtype=np.int32)

        def pad1(arr, fill):
            # Zero-length arc classes still need gatherable arrays; row_ptrs
            # never reference the dummy entry (all counts are 0).
            if arr.shape[0] == 0:
                return np.full(1, fill, dtype=arr.dtype)
            return arr

        return cls(
            emit_ptr=jnp.asarray(emit_ptr),
            emit_next=jnp.asarray(pad1(fst.next_state[emit_idx], 0)),
            emit_pdf=jnp.asarray(pad1(tid2pdf[emit_ilabel], 0)),
            emit_olabel=jnp.asarray(pad1(fst.olabel[emit_idx], 0)),
            emit_weight=jnp.asarray(pad1(fst.weight[emit_idx], np.inf)),
            eps_ptr=jnp.asarray(eps_ptr),
            eps_next=jnp.asarray(pad1(fst.next_state[eps_idx], 0)),
            eps_olabel=jnp.asarray(pad1(fst.olabel[eps_idx], 0)),
            eps_weight=jnp.asarray(pad1(fst.weight[eps_idx], np.inf)),
            final=jnp.asarray(fst.final),
            start_state=int(fst.start_state),
            eps_depth=int(fst.eps_depth),
            emit_max_degree=int(np.diff(emit_ptr).max()) if len(emit_ptr) > 1
            else 0,
            eps_max_degree=int(np.diff(eps_ptr).max()) if len(eps_ptr) > 1
            else 0,
        )

    # Make hashable-by-identity so jitted functions can close over it.
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


# ---------------------------------------------------------------------------
# Core primitives
# ---------------------------------------------------------------------------

def expand_arcs(states: jnp.ndarray, ptr: jnp.ndarray,
                budget: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CSR arc expansion with a fixed budget.

    For each token (states, -1 = empty) enumerate its arc range
    ``ptr[s]..ptr[s+1]`` into a flat list of at most ``budget`` entries via
    prefix sums + searchsorted.  Returns (arc_idx, tok_idx, valid) each of
    shape (budget,).  If the true total exceeds the budget, the *last* tokens'
    arcs are dropped — callers sort tokens best-cost-first so the loss falls
    on the worst tokens (a tightening of max-active pruning).
    """
    k = states.shape[0]
    safe = jnp.maximum(states, 0)
    start = ptr[safe]
    cnt = jnp.where(states < 0, 0, ptr[safe + 1] - start)
    offsets = jnp.cumsum(cnt)                       # inclusive, (K,)
    total = offsets[-1]
    e = jnp.arange(budget, dtype=jnp.int32)
    tok = jnp.searchsorted(offsets, e, side="right").astype(jnp.int32)
    tok_c = jnp.minimum(tok, k - 1)
    prev_off = jnp.where(tok_c > 0, offsets[tok_c - 1], 0)
    arc = start[tok_c] + (e - prev_off)
    valid = e < jnp.minimum(total, budget)
    return jnp.where(valid, arc, 0), tok_c, valid


def select_beam(state: jnp.ndarray, cost: jnp.ndarray, prev: jnp.ndarray,
                word: jnp.ndarray, k: int,
                beam_width: jnp.ndarray) -> Tuple[Beam, jnp.ndarray, jnp.ndarray]:
    """Dedup-by-state (keep min cost) + beam prune + exact top-K.

    Replaces HashTable insert-min (decoder.cc:99-130) with a stable
    lexicographic sort on (state, cost) and a first-of-run mask, and the
    sampled cutoff (decoder.cc:132-182) with an exact top-K.  The stable sort
    preserves the reference's keep-existing-on-tie semantics when callers
    order existing tokens before new candidates.  Sort payload is a single
    index array; prev/word gather through it afterwards.
    """
    n = state.shape[0]
    best = jnp.min(cost)
    cost = jnp.where(cost <= best + beam_width, cost, jnp.inf)
    state_key = jnp.where(jnp.isinf(cost), INT_MAX, state)
    iota = jnp.arange(n, dtype=jnp.int32)
    s_state, s_cost, s_idx = jax.lax.sort(
        (state_key, cost, iota), num_keys=2, is_stable=True)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s_state[1:] != s_state[:-1]])
    s_cost = jnp.where(first, s_cost, jnp.inf)
    neg_top, idx = jax.lax.top_k(-s_cost, k)
    new_cost = -neg_top
    src = s_idx[idx]
    new_state = jnp.where(jnp.isinf(new_cost), -1, s_state[idx])
    new_prev = prev[src]
    new_word = jnp.where(jnp.isinf(new_cost), 0, word[src])
    return Beam(new_state, new_cost), new_prev, new_word


# ---------------------------------------------------------------------------
# Frame step
# ---------------------------------------------------------------------------

def _emitting(beam: Beam, scores_t: jnp.ndarray, g: GraphArrays,
              opts: DecoderOptions) -> Tuple[Beam, jnp.ndarray, jnp.ndarray]:
    """One ProcessEmitting (decoder.cc:224-301): expand non-eps arcs, score,
    prune, dedup, select."""
    k = beam.state.shape[0]
    if k * g.emit_max_degree <= opts.expand_budget:
        # Budget provably covers every arc of every token — skip the
        # best-first ordering used for principled truncation.
        order = jnp.arange(k, dtype=jnp.int32)
        s_state, s_cost = beam.state, beam.cost
    else:
        order = jnp.argsort(beam.cost).astype(jnp.int32)
        s_state = beam.state[order]
        s_cost = beam.cost[order]
    arc, tok, valid = expand_arcs(s_state, g.emit_ptr, opts.expand_budget)
    ac_cost = -scores_t[g.emit_pdf[arc]]     # scores already acoustic-scaled
    cand_cost = s_cost[tok] + g.emit_weight[arc] + ac_cost
    cand_cost = jnp.where(valid, cand_cost, jnp.inf)
    cand_state = jnp.where(valid, g.emit_next[arc], -1)
    cand_prev = order[tok]                   # slot in previous generation
    cand_word = jnp.where(valid, g.emit_olabel[arc], 0)
    return select_beam(cand_state, cand_cost, cand_prev, cand_word, k,
                       jnp.float32(opts.beam))


def _eps_sweep(beam: Beam, g: GraphArrays, opts: DecoderOptions,
               beam_width) -> Tuple[Beam, jnp.ndarray, jnp.ndarray]:
    """One epsilon relaxation sweep (work-list DFS → data-parallel sweep,
    decoder.cc:186-221).  Existing tokens are carried as candidates with
    identity backpointers so surviving tokens keep their history."""
    k = beam.state.shape[0]
    if k * g.eps_max_degree <= opts.expand_budget:
        order = jnp.arange(k, dtype=jnp.int32)
        s_state, s_cost = beam.state, beam.cost
    else:
        order = jnp.argsort(beam.cost).astype(jnp.int32)
        s_state = beam.state[order]
        s_cost = beam.cost[order]
    arc, tok, valid = expand_arcs(s_state, g.eps_ptr, opts.expand_budget)
    cand_cost = jnp.where(valid, s_cost[tok] + g.eps_weight[arc], jnp.inf)
    cand_state = jnp.where(valid, g.eps_next[arc], -1)
    cand_prev = order[tok]
    cand_word = jnp.where(valid, g.eps_olabel[arc], 0)

    keep_slot = jnp.arange(k, dtype=jnp.int32)
    all_state = jnp.concatenate([beam.state, cand_state])
    all_cost = jnp.concatenate([beam.cost, cand_cost])
    all_prev = jnp.concatenate([keep_slot, cand_prev])
    all_word = jnp.concatenate([jnp.zeros(k, jnp.int32), cand_word])
    return select_beam(all_state, all_cost, all_prev, all_word, k, beam_width)


def _identity_record(k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.arange(k, dtype=jnp.int32), jnp.zeros(k, jnp.int32)


def frame_step(beam: Beam, scores_t: jnp.ndarray, frame_valid: jnp.ndarray,
               g: GraphArrays, opts: DecoderOptions,
               num_eps_iters: int) -> Tuple[Beam, StepRecord]:
    """Emitting pass + G epsilon sweeps for one frame; masked no-op when the
    frame is padding (``frame_valid`` False)."""
    k = beam.state.shape[0]
    new_beam, prev0, word0 = _emitting(beam, scores_t, g, opts)

    def sweep(b, _):
        nb, p, w = _eps_sweep(b, g, opts, jnp.float32(opts.beam))
        return nb, (p, w)

    final_beam, (prevs, words) = jax.lax.scan(
        sweep, new_beam, None, length=num_eps_iters)

    rec_prev = jnp.concatenate([prev0[None], prevs], axis=0)
    rec_word = jnp.concatenate([word0[None], words], axis=0)

    # Padding frames: keep the beam and write identity records.
    id_prev, id_word = _identity_record(k)
    id_prev = jnp.broadcast_to(id_prev, rec_prev.shape)
    id_word = jnp.broadcast_to(id_word, rec_word.shape)
    out_beam = Beam(
        jnp.where(frame_valid, final_beam.state, beam.state),
        jnp.where(frame_valid, final_beam.cost, beam.cost))
    rec = StepRecord(
        jnp.where(frame_valid, rec_prev, id_prev),
        jnp.where(frame_valid, rec_word, id_word))
    return out_beam, rec


# ---------------------------------------------------------------------------
# Init / chunk drivers (single utterance; batch via vmap in decoder.py)
# ---------------------------------------------------------------------------

def init_beam(g: GraphArrays, opts: DecoderOptions,
              num_eps_iters: int) -> Tuple[Beam, StepRecord]:
    """InitDecoding (decoder.cc:79-97): start token + eps closure w/o cutoff."""
    k = opts.max_active
    state = jnp.full((k,), -1, jnp.int32).at[0].set(g.start_state)
    cost = jnp.full((k,), jnp.inf, jnp.float32).at[0].set(0.0)
    beam = Beam(state, cost)

    def sweep(b, _):
        nb, p, w = _eps_sweep(b, g, opts, jnp.float32(jnp.inf))
        return nb, (p, w)

    beam, (prevs, words) = jax.lax.scan(sweep, beam, None,
                                        length=num_eps_iters)
    return beam, StepRecord(prevs, words)


@partial(jax.jit, static_argnames=("g", "opts", "num_eps_iters"))
def decode_chunk(beam: Beam, scores: jnp.ndarray, frame_valid: jnp.ndarray,
                 g: GraphArrays, opts: DecoderOptions,
                 num_eps_iters: int) -> Tuple[Beam, StepRecord]:
    """Scan ``frame_step`` over a chunk.

    beam:        pytree with leading batch axis B on each leaf
    scores:      (B, C, P) acoustic-scaled log-likelihoods
    frame_valid: (B, C) bool
    returns (new beam, records with shape (B, C, 1+G, K)).
    """
    def body(b, xs):
        s_t, v_t = xs
        step = partial(frame_step, g=g, opts=opts,
                       num_eps_iters=num_eps_iters)
        nb, rec = jax.vmap(step)(b, s_t, v_t)
        return nb, rec

    xs = (jnp.swapaxes(scores, 0, 1), jnp.swapaxes(frame_valid, 0, 1))
    new_beam, recs = jax.lax.scan(body, beam, xs)
    recs = StepRecord(jnp.swapaxes(recs.prev, 0, 1),
                      jnp.swapaxes(recs.word, 0, 1))
    return new_beam, recs


@partial(jax.jit, static_argnames=("batch", "g", "opts", "num_eps_iters"))
def init_beam_batch(batch: int, g: GraphArrays, opts: DecoderOptions,
                    num_eps_iters: int) -> Tuple[Beam, StepRecord]:
    def one(_):
        return init_beam(g, opts, num_eps_iters)
    return jax.vmap(one)(jnp.arange(batch))


@jax.jit
def traceback_chunk(slot: jnp.ndarray, rec: StepRecord):
    """Walk one chunk's records backwards on device.

    slot: (B,) current slot (entering from the NEXT chunk / final beam);
    rec:  records with shapes (B, C, G, K).
    Returns (new slot (B,), words (B, C, G)) where words[b, t, g] is the
    olabel collected at that generation (0 = none), to be read backwards
    (t descending, g descending) by the host assembler.

    This keeps the giant (B, C, G, K) arrays on device — only the (B, C, G)
    word plane crosses to the host, which matters when the host↔device link
    is the bottleneck.
    """
    def per_utt(s, prev, word):           # prev/word: (C, G, K)
        def step_t(s, xs):
            prev_t, word_t = xs           # (G, K)
            def step_g(s2, xs2):
                p, w = xs2                # (K,)
                s2c = jnp.maximum(s2, 0)
                return p[s2c], w[s2c]
            s, words_rev = jax.lax.scan(step_g, s,
                                        (prev_t[::-1], word_t[::-1]))
            return s, words_rev[::-1]     # (G,)
        s, words_rev = jax.lax.scan(step_t, s, (prev[::-1], word[::-1]))
        return s, words_rev[::-1]         # (C, G)

    return jax.vmap(per_utt)(slot, rec.prev, rec.word)


@partial(jax.jit, static_argnames=("g",))
def best_final(beam: Beam, g: GraphArrays):
    """argmin over cost + final(state) (BestPath head, decoder.cc:308-319).

    Returns (slot, total_cost, final_weight); slot = -1 if no reachable final
    state.  Batched via leading axes.
    """
    safe = jnp.maximum(beam.state, 0)
    fin = jnp.where(beam.state >= 0, g.final[safe], jnp.inf)
    total = beam.cost + fin
    slot = jnp.argmin(total, axis=-1)
    best = jnp.take_along_axis(total, slot[..., None], axis=-1)[..., 0]
    best_fin = jnp.take_along_axis(fin, slot[..., None], axis=-1)[..., 0]
    slot = jnp.where(jnp.isinf(best), -1, slot)
    return slot, best, best_fin
