"""Pooled-beam Viterbi decode: capacity priced at occupancy, not worst case.

Why this exists.  Beam demand on real workloads is BURSTY: on the bench pack
the median per-frame in-beam token count is 243 (p90 = 815), yet a handful
of acoustically uninformative frames per utterance flood the beam past 8192
(`scripts/probe_occupancy.py`).  Exact parity with the reference therefore
needs max-active-scale capacity (it keeps up to 30 000 tokens,
`src/decoder.h:45`, so burst frames survive) — but a static per-lane beam
pays the burst price on EVERY frame: at K=16384 the per-frame candidate sort
dominates and throughput collapses to 0.25x the reference binary.

The pooled design shares ONE token pool across all lanes of the batch:

    per-lane (B, K) arrays  →  pool (Kp,) arrays [lane, state, cost]

Lanes draw capacity on demand — a lane may hold up to ``max_active`` tokens
during its burst while quiet lanes hold a few hundred — and the pool is
sized for the SUM of demands (law of large numbers smooths the bursts:
B·E[occupancy] + a burst allowance, far below B·K_max).  All shapes stay
static (XLA requirement); per-lane width is dynamic inside them.

Layout invariant (established by every frame step):
  * tokens sorted lane-major, cost-ascending within each lane;
  * each lane's run is padded to a multiple of GROUP tokens with dead slots
    (state = -1, cost = +inf) that carry the lane id;
  * the global tail beyond all runs is dead with lane = LANE_DEAD.

The 128-token (GROUP) alignment is what keeps acoustic scoring on the fast
path: each group of GROUP·arcs candidates belongs to ONE lane, so per-frame
scores are fetched as G row-gathers of the (B, P) score matrix and looked
up with the same factorized one-hot MXU lookup the per-lane decoder uses
(`beam.lookup_scores`) — no per-candidate (lane, pdf) 2-D gather, which
XLA:TPU would serialize.

Frame step = expansion (dense block row-gather, `beam.ArcBlocks`) + two
pool-wide sorts + a computed placement:
  A. dedup:   sort by (lane·(S+1)+state, cost); first-of-run keeps the
              min-cost token per (lane, state)  [HashTable insert-min,
              decoder.cc:99-130, across the whole batch at once]
  B. rank:    sort by (lane, cost); per-lane beam prune vs the run head,
              per-lane rank cap (max_active)    [GetCutoff/top-K semantics]
  placement: NOT a sort.  Survivors are a PREFIX of each lane's sorted run
              (all pruning predicates are monotone in within-run cost
              order), so the GROUP-aligned pool layout is an inverse map —
              output slot p of lane l gathers source run_start[l] +
              (p − base[l]) — one cumsum, two searchsorteds, two packed
              row gathers (see _rank_and_place).
The sorts run over ~Kp·(arcs_per_token+1) elements, independent of
per-lane skew — that is the whole point: burst lanes no longer multiply
against quiet lanes' static width.

Exactness: when no frame sets the pool-overflow flag (survivors + padding
exceeding Kp), the decode is IDENTICAL to the per-lane decoder at
K = max_active — verified token-for-token in tests/test_pooled.py.  On
overflow the decoder retries the chunk at the next pool-ladder rung (a
static ≤6-rung set per (batch, max_active); learned per-chunk rungs carry
over to the next decode), so results are never silently wrong and growth
cannot trigger unbounded recompilation.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..hparams import DecoderOptions
from .beam import (ArcBlocks, Beam, GraphArrays, _first_of_run,
                   _split_planes, decode_chunk_k,
                   init_beam_batch, lookup_scores_onehot, pad_beam,
                   repeat_last, resolve_eps_iters, shrink_beam,
                   traceback_chunk, INT_MAX)

GROUP = 128          # tokens per lane-uniform score group (pool alignment)
LANE_DEAD = INT_MAX  # lane id of the dead global tail


class PoolBeam(NamedTuple):
    """Pooled tokens, lane-major cost-sorted, GROUP-aligned lane runs.

    lane:  (Kp,) int32 — owning lane; LANE_DEAD past the last run.  Dead
           padding INSIDE a run carries the run's lane id.
    state: (Kp,) int32 — graph state, -1 for dead slots.
    cost:  (Kp,) float32 — +inf for dead slots.
    """
    lane: jnp.ndarray
    state: jnp.ndarray
    cost: jnp.ndarray


class PoolRecord(NamedTuple):
    """Backpointers of one pooled frame: ``prev`` indexes the PREVIOUS
    pool's slots; generations as in beam.StepRecord ((G, Kp) each)."""
    prev: jnp.ndarray
    word: jnp.ndarray


def _propagate_run_head(first: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
    """For each position, the ``val`` at the start of its run.

    Segmented "latest set value" via an associative scan over (set, value)
    pairs — O(N log N) elementwise, no gathers.
    """
    def combine(a, b):
        a_set, a_val = a
        b_set, b_val = b
        return a_set | b_set, jnp.where(b_set, b_val, a_val)

    _, out = jax.lax.associative_scan(combine, (first, val))
    return out


def _lane_table_lookup(table: jnp.ndarray, lane: jnp.ndarray) -> jnp.ndarray:
    """``table[lane]`` for a small (B,)-table — one-hot matmul, no gather.

    lane may contain LANE_DEAD / out-of-range values; they map to 0.
    """
    b = table.shape[0]
    oh = jax.nn.one_hot(jnp.clip(lane, 0, b - 1), b, dtype=jnp.float32)
    oh = oh * (lane >= 0)[..., None] * (lane < b)[..., None]
    out = jnp.einsum("nb,b->n", oh, table.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return out


def _expand_pool(pool: PoolBeam, blocks: ArcBlocks):
    """Dense per-token expansion in pool space (beam.expand_dense, minus the
    batch axis): every token fetches its ``max_blocks`` rows."""
    kp = pool.state.shape[0]
    mb = max(1, blocks.max_blocks)
    nb = blocks.packed.shape[0] - 1
    width = blocks.packed.shape[-1]
    safe = jnp.maximum(pool.state, 0)
    start = blocks.blk_ptr[safe]
    cnt = jnp.where(pool.state < 0, 0, blocks.blk_ptr[safe + 1] - start)
    j = jnp.arange(mb, dtype=jnp.int32)
    blk = jnp.where(j < cnt[:, None], start[:, None] + j, nb)
    rows = blocks.packed[blk.reshape(-1)].reshape(kp * mb, width)
    nxt, pdf, olabel, olabel2, weight = _split_planes(rows, blocks)
    tok_cost = repeat_last(pool.cost, mb)
    tok_slot = repeat_last(jnp.arange(kp, dtype=jnp.int32), mb)
    tok_lane = repeat_last(pool.lane, mb)
    return nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, tok_lane


def _score_groups(scores_t: jnp.ndarray, pdf: jnp.ndarray,
                  group_lane: jnp.ndarray) -> jnp.ndarray:
    """Acoustic scores for group-uniform candidates.

    scores_t:   (B, P) frame scores
    pdf:        (G, W) candidate pdf ids, group g entirely owned by
                group_lane[g] (GROUP-alignment invariant)
    group_lane: (G,) int32, LANE_DEAD for dead tail groups
    returns     (G, W) scores (dead groups get lane-0 scores; their weights
                are +inf so the value never matters)
    """
    safe = jnp.clip(group_lane, 0, scores_t.shape[0] - 1)
    table = scores_t[safe]                 # (G, P) row gather — fast class
    # one-hot path FORCED: lookup_scores' size heuristic sees the per-call
    # (per-group) index count, which is small — but the batched total is the
    # frame's whole candidate set, exactly the regime where XLA:TPU's
    # per-index gather cost dominates.
    return jax.vmap(lookup_scores_onehot)(table, pdf)


def _pool_eps_sweep(pool: PoolBeam, frame_valid: jnp.ndarray,
                    g: GraphArrays, opts: DecoderOptions, b: int,
                    s_plus: int, cap: int, kp: int):
    """One epsilon relaxation sweep in POOL layout (the pooled analogue of
    beam._eps_sweep — VERDICT r4 next #4: unfoldable graphs previously lost
    the whole pooled tier).

    Every existing token is carried as a keep-candidate (identity prev,
    word 0) CONCATENATED BEFORE the eps-arc candidates, so stable-sort
    dedup preserves the reference's keep-existing-on-tie semantics
    (decoder.cc:116-128).  Invalid lanes contribute no arc candidates —
    their tokens ride through untouched.  This is the FALLBACK tier: the
    concat costs one extra Kp of sort length and the prev/word payloads
    ride the sorts (no arcden trick — keeps break the token-major layout);
    folded graphs never come here.

    Returns (pool', rec_prev (Kp,), rec_word (Kp,), overflow, demand,
    maxcnt)."""
    nxt, _pdf, olabel, _ol2, weight, tok_cost, tok_slot, tok_lane = \
        _expand_pool(pool, g.eps)
    arcs = nxt.shape[1]
    mb = nxt.shape[0] // kp
    cand_cost = tok_cost[:, None] + weight
    keep_valid = _lane_table_lookup(frame_valid.astype(jnp.float32),
                                    pool.lane) > 0.5
    cand_cost = jnp.where(repeat_last(keep_valid, mb)[:, None], cand_cost,
                          jnp.inf)

    state = jnp.concatenate([pool.state, nxt.reshape(-1)])
    cost = jnp.concatenate([pool.cost, cand_cost.reshape(-1)])
    lane = jnp.concatenate([pool.lane, repeat_last(tok_lane, arcs)])
    prev = jnp.concatenate([jnp.arange(kp, dtype=jnp.int32),
                            repeat_last(tok_slot, arcs)])
    word = jnp.concatenate([jnp.zeros(kp, jnp.int32), olabel.reshape(-1)])

    finite = jnp.isfinite(cost) & (state >= 0)
    combo = jnp.where(finite, lane * s_plus + jnp.maximum(state, 0),
                      INT_MAX)
    sA = jax.lax.sort((combo, cost, prev, word), num_keys=2, is_stable=True)
    keep = _first_of_run(sA[0]) & (sA[0] != INT_MAX)
    a_lane = jnp.where(keep, sA[0] // s_plus, LANE_DEAD)
    a_state = jnp.where(keep, sA[0] % s_plus, -1)
    a_cost = jnp.where(keep, sA[1], jnp.inf)
    pool2, placed, ov, dem, cnt = _rank_and_place(
        a_lane, a_cost, a_state, (sA[2], sA[3]), b, cap, kp,
        jnp.float32(opts.beam))
    live = pool2.state >= 0
    return (pool2, jnp.where(live, placed[0], 0),
            jnp.where(live, placed[1], 0), ov, dem, cnt)


def pool_frame_step(pool: PoolBeam, scores_t: jnp.ndarray,
                    frame_valid: jnp.ndarray, g: GraphArrays,
                    opts: DecoderOptions, num_eps_iters: int = 0
                    ) -> Tuple[PoolBeam, PoolRecord, jnp.ndarray, jnp.ndarray]:
    """One frame over the pool: emitting select, plus ``num_eps_iters``
    pooled epsilon sweeps when the graph is not eps-folded.

    scores_t (B, P); frame_valid (B,).  Returns (pool', record, overflow,
    demand, maxcnt) where overflow is a scalar bool — the pool could not
    hold this frame's survivors (results for the frame are then unusable;
    callers retry the chunk with a bigger pool) — demand is the frame's
    true slot requirement (sum of GROUP-rounded per-lane survivor counts),
    the telemetry that drives the per-chunk pool schedule — and maxcnt is
    the largest per-lane survivor count (maxcnt == the effective rank cap
    means some lane's beam FILLED, the capacity-escalation signal).

    Unfolded graphs (num_eps_iters > 0): overflow/demand/maxcnt are OR/max
    over ALL of the frame's selects — per-select accounting keeps the
    filled-flag SOUND here (a later sweep shrinking the beam cannot mask an
    earlier select's truncation, the decode_chunk_k pitfall), so both pool
    growth and capacity escalation stay exact on the fallback tier.  The
    record gains one generation per sweep.
    """
    b = scores_t.shape[0]
    s_plus = int(np.int64(g.final.shape[0])) + 1
    kp = pool.state.shape[0]
    cap = min(opts.max_active, kp)

    # --- expansion + scoring -------------------------------------------
    nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, tok_lane = \
        _expand_pool(pool, g.emit)
    n = nxt.shape[0] * nxt.shape[1]
    arcs = nxt.shape[1]
    kp_now = pool.state.shape[0]
    ng = kp_now // GROUP
    group_lane = pool.lane[::GROUP]
    # (Kp·mb, BLOCK) → (G, GROUP·mb·BLOCK): group g's candidates are all
    # owned by group_lane[g] (pool alignment invariant).
    pdf_g = pdf.reshape(ng, -1)
    # A Pallas fused-scoring kernel lived here in r3/r4 (opt-in, could not
    # activate on this toolchain); deleted in r5 — measured record in
    # docs/PERFORMANCE.md "score_fuse disposition".
    ac = _score_groups(scores_t, pdf_g, group_lane)
    ac = ac.reshape(nxt.shape)
    cand_cost = tok_cost[:, None] + weight - ac

    # Invalid lanes: suppress new candidates and carry existing tokens IN
    # PLACE — each carried token rides its own candidate slot (block 0,
    # lane 0) with identity semantics (state, cost, word 0; its prev is the
    # owning token, which slot position already encodes).  The round-3 form
    # concatenated all Kp keep-tokens after the candidates, making the sort
    # length Kp·(mb·B+1): one Kp past a power of two, which XLA:TPU pads
    # back up to the NEXT power — the tail Kp doubled every sort network in
    # the frame step (measured: a 4-operand sort at Kp·18 costs 2.05× the
    # Kp·16 sort).  The lane→valid lookup runs once per pool SLOT and is
    # broadcast out to candidates.
    keep_valid = _lane_table_lookup(frame_valid.astype(jnp.float32),
                                    pool.lane) > 0.5
    mb = nxt.shape[0] // kp_now
    carry = (~keep_valid) & (pool.state >= 0)        # (Kp,)
    cc3 = jnp.where(repeat_last(keep_valid, mb)[:, None], cand_cost,
                    jnp.inf).reshape(kp_now, mb * arcs)
    st3 = nxt.reshape(kp_now, mb * arcs)
    wd3 = olabel.reshape(kp_now, mb * arcs)
    cc3 = cc3.at[:, 0].set(jnp.where(carry, pool.cost, cc3[:, 0]))
    st3 = st3.at[:, 0].set(jnp.where(carry, pool.state, st3[:, 0]))
    wd3 = wd3.at[:, 0].set(jnp.where(carry, 0, wd3[:, 0]))

    c_lane = repeat_last(pool.lane, mb * arcs)
    if olabel2 is not None:
        w23 = olabel2.reshape(kp_now, mb * arcs)
        w23 = w23.at[:, 0].set(jnp.where(carry, 0, w23[:, 0]))
        c_word2 = w23.reshape(n)
    else:
        c_word2 = None

    out = _pool_select(st3.reshape(n), cc3.reshape(n), c_lane,
                       wd3.reshape(n), c_word2, mb * arcs, b, s_plus,
                       cap, kp, jnp.float32(opts.beam), g,
                       pack_words=g.max_olabel < 32768)
    if g.folded or num_eps_iters == 0:
        return out
    pool1, rec, ov, dem, cnt = out
    prevs, words = [rec.prev], [rec.word]           # (2, Kp) emitting gens
    for _ in range(num_eps_iters):
        pool1, rp, rw, ov_s, dem_s, cnt_s = _pool_eps_sweep(
            pool1, frame_valid, g, opts, b, s_plus, cap, kp)
        prevs.append(rp[None])
        words.append(rw[None])
        ov = ov | ov_s
        dem = jnp.maximum(dem, dem_s)
        cnt = jnp.maximum(cnt, cnt_s)
    rec = PoolRecord(jnp.concatenate(prevs, axis=0),
                     jnp.concatenate(words, axis=0))
    return pool1, rec, ov, dem, cnt


def _pool_select(state, cost, lane, word, word2, arcden, b, s_plus, cap, kp,
                 beam_width, g: GraphArrays, pack_words: bool
                 ) -> Tuple[PoolBeam, PoolRecord, jnp.ndarray, jnp.ndarray]:
    """Dedup + per-lane beam/cap prune + GROUP-aligned placement.

    Sort-operand diet (bandwidth is the sort's cost — measured 9.3 ms for
    the 5-operand rank sort at Kp=131072, docs/PERFORMANCE.md r4): nothing
    rides the sorts but keys and ONE candidate index.

      * ``state`` — encoded bijectively in the dedup key
        ``lane·(S+1)+state`` (recovered by one mod after sort A);
      * ``prev`` — a pure FUNCTION of the candidate's flat index
        (``idx // arcden``: candidates are laid out token-major with
        ``arcden`` slots per token, and a carried token rides its own
        token's slot 0, so the identity-prev falls out of the same
        formula);
      * the word labels — fetched AFTER placement with one Kp-sized gather
        from the pre-sort candidate array (``warr[out_idx]``), instead of
        riding 16·Kp-sized sorts; when every olabel fits 15 bits
        (``pack_words``, static graph property) both labels pack into one
        int32 so one gather covers them.

    All transforms are bijective on the payloads, so selection (decided by
    the keys + stable order alone) is bit-identical to the payload-riding
    form (pinned by tests/test_pooled.py token-for-token).
    """
    n = state.shape[0]
    finite = jnp.isfinite(cost)
    # ---- sort A: dedup by (lane, state), min cost ----------------------
    combo = jnp.where(finite, lane * s_plus + jnp.maximum(state, 0),
                      INT_MAX)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    sA = jax.lax.sort((combo, cost, idx), num_keys=2, is_stable=True)
    a_combo, a_cost, a_idx = sA
    keep = _first_of_run(a_combo) & (a_combo != INT_MAX)
    a_lane = jnp.where(keep, a_combo // s_plus, LANE_DEAD)
    a_state = jnp.where(keep, a_combo % s_plus, -1)
    a_cost = jnp.where(keep, a_cost, jnp.inf)

    # ---- sort B: per-lane cost order; beam + cap prune -----------------
    pool, placed, overflow, demand, maxcnt = _rank_and_place(
        a_lane, a_cost, a_state, (a_idx,), b, cap, kp, beam_width)
    out_idx = placed[0]
    live = pool.state >= 0
    rec_prev = jnp.where(live, out_idx // arcden, 0)
    if pack_words:
        warr = word * 65536 + (word2 if word2 is not None else 0)
        got = warr[out_idx]
        rec_word, rec_word2 = got // 65536, got % 65536
    else:
        warr = jnp.stack(
            [word, word2 if word2 is not None
             else jnp.zeros_like(word)], axis=1)          # (n, 2)
        got = warr[out_idx]
        rec_word, rec_word2 = got[:, 0], got[:, 1]
    rec_word = jnp.where(live, rec_word, 0)
    rec_word2 = jnp.where(live, rec_word2, 0)

    # folded 2-word arcs: generation 0 = (prev, word), generation 1 =
    # (identity, word2) — identical record contract to beam.frame_step.
    id_slot = jnp.arange(kp, dtype=jnp.int32)
    rec = PoolRecord(jnp.stack([rec_prev, id_slot]),
                     jnp.stack([rec_word, rec_word2]))
    return pool, rec, overflow, demand, maxcnt


def _rank_and_place(lane, cost, state, payloads, b, cap, kp, beam_width=None):
    """Per-lane rank/beam prune (sort B) + GROUP-aligned placement.

    Inputs are flat candidate arrays (lane = LANE_DEAD for dead entries);
    within-lane ties keep input order (stable sort).  Returns
    (PoolBeam(kp), placed payloads (kp,), overflow, demand, maxcnt) where
    maxcnt is the LARGEST per-lane survivor count — maxcnt == the rank cap
    means some lane's beam came back full, i.e. the cap may have truncated
    (the capacity-escalation signal, VERDICT r4 next #1).  beam_width
    None skips beam pruning (repack of an already-pruned token set).

    Placement is COMPUTED, not sorted.  After sort B every lane's run is
    cost-ascending, and all three pruning predicates are monotone in that
    order (rank cap: by construction; beam: cost ≤ head + width; finite:
    +inf sorts last) — so the survivors form a PREFIX of each run.  The
    pool layout is therefore an inverse map: output slot p of lane l takes
    source position run_start[l] + (p − base[l]), fetched with one packed
    row gather of kp indices.  The round-2 formulation materialized pad
    tokens and re-sorted all n candidates by target slot (a third 6-operand
    sort) plus two (n, B) one-hot matmuls for the lane tables — measured
    ~9 ms/frame of the 21.5 ms step at Kp=32k vs ~1 ms for this form
    (docs/PERFORMANCE.md r3)."""
    n = state.shape[0]
    sB = jax.lax.sort((lane, cost, state) + tuple(payloads), num_keys=2,
                      is_stable=True)
    b_lane, b_cost, b_state = sB[0], sB[1], sB[2]
    b_pay = sB[3:]
    first = _first_of_run(b_lane)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    run_start = _propagate_run_head(first, idx)
    rank = idx - run_start
    alive = (b_lane != LANE_DEAD) & (rank < cap) & jnp.isfinite(b_cost)
    if beam_width is not None:
        run_best = _propagate_run_head(first, b_cost)
        alive &= b_cost <= run_best + beam_width

    # ---- per-lane survivor counts: ONE cumsum + run-boundary lookups ---
    # b_lane is sorted ascending, so lane l's run spans
    # bounds[l]..bounds[l+1]; alive is a prefix of each run (see above).
    csum = jnp.cumsum(alive.astype(jnp.int32))
    csum0 = jnp.concatenate([jnp.zeros(1, jnp.int32), csum])
    bounds = jnp.searchsorted(
        b_lane, jnp.arange(b + 1, dtype=b_lane.dtype), side="left"
    ).astype(jnp.int32)
    counts = csum0[bounds[1:]] - csum0[bounds[:-1]]             # (B,)
    padded = -(-counts // GROUP) * GROUP                        # (B,)
    ends = jnp.cumsum(padded)                                   # (B,)
    demand = ends[-1]
    overflow = demand > kp
    maxcnt = jnp.max(counts)

    # ---- inverse placement: slot p → source position ------------------
    p = jax.lax.broadcasted_iota(jnp.int32, (kp, 1), 0)[:, 0]
    # tiny sorted table, kp queries: brute compare beats the binary-search
    # scan (which would issue log2(B) rounds of kp-sized gathers)
    lane_of = jnp.searchsorted(ends, p, side="right",
                               method="compare_all").astype(jnp.int32)
    safe_lane = jnp.clip(lane_of, 0, b - 1)
    # one row gather for the three per-lane tables
    tables = jnp.stack([ends - padded, counts, bounds[:-1]], axis=1)
    fetched = tables[safe_lane]                                 # (kp, 3)
    r = p - fetched[:, 0]
    live = (lane_of < b) & (r < fetched[:, 1])
    src = jnp.where(live, fetched[:, 2] + r, 0)

    # one packed row gather for all sorted operands
    packed_rows = jnp.stack(
        (b_state, jax.lax.bitcast_convert_type(b_cost, jnp.int32))
        + tuple(b_pay), axis=1)                                 # (n, 2+P)
    got = packed_rows[src]                                      # (kp, 2+P)
    # dead padding INSIDE a run carries the run's lane id (layout
    # invariant); only the tail past all runs is LANE_DEAD
    out_lane = jnp.where(lane_of < b, safe_lane, LANE_DEAD)
    out_state = jnp.where(live, got[:, 0], -1)
    out_cost = jnp.where(
        live, jax.lax.bitcast_convert_type(got[:, 1], jnp.float32), jnp.inf)
    pool = PoolBeam(out_lane, out_state, out_cost)
    placed = tuple(jnp.where(live, got[:, 2 + j], 0)
                   for j in range(len(b_pay)))
    return pool, placed, overflow, demand, maxcnt


def pool_reset_lanes(pool: PoolBeam, reset_mask: jnp.ndarray,
                     init_state: jnp.ndarray, init_cost: jnp.ndarray,
                     b: int, cap: int, kp: int):
    """Kill reset lanes' tokens, insert the (lane-shared) init closure for
    them, and repack GROUP-aligned — the pooled analogue of streaming's
    masked per-lane beam reset (streaming.py ``_reset_lanes``).

    init_state/init_cost: the start-state eps closure, identical for every
    lane (same graph, same start state); dead init slots carry state -1 /
    cost +inf.  Returns (pool', bridge_prev (kp,), overflow, demand):
    bridge_prev[slot'] is the PRE-reset pool slot for surviving tokens and
    the INIT-CLOSURE slot for inserted ones — a traceback crosses into init
    space exactly at its own lane's attach event, so no tag is needed.
    """
    kp_now = pool.state.shape[0]
    k0 = init_state.shape[0]
    resetf = reset_mask.astype(jnp.float32)
    is_reset = _lane_table_lookup(resetf, pool.lane) > 0.5
    k_cost = jnp.where(is_reset, jnp.inf, pool.cost)
    k_lane = jnp.where(jnp.isfinite(k_cost), pool.lane, LANE_DEAD)

    i_lane = repeat_last(jnp.arange(b, dtype=jnp.int32), k0)
    i_state = jnp.tile(init_state, b)
    i_cost = jnp.tile(init_cost, b)
    i_live = (_lane_table_lookup(resetf, i_lane) > 0.5) & \
        jnp.isfinite(i_cost) & (i_state >= 0)
    i_cost = jnp.where(i_live, i_cost, jnp.inf)
    i_lane = jnp.where(i_live, i_lane, LANE_DEAD)

    lane = jnp.concatenate([k_lane, i_lane])
    state = jnp.concatenate([pool.state, i_state])
    cost = jnp.concatenate([k_cost, i_cost])
    prev = jnp.concatenate([jnp.arange(kp_now, dtype=jnp.int32),
                            jnp.tile(jnp.arange(k0, dtype=jnp.int32), b)])
    pool2, placed, ov, dem, _cnt = _rank_and_place(lane, cost, state,
                                                   (prev,), b, cap, kp)
    return pool2, placed[0], ov, dem


def _pool_decode_chunk_impl(pool: PoolBeam, scores: jnp.ndarray,
                            frame_valid: jnp.ndarray, g: GraphArrays,
                            opts: DecoderOptions, num_eps_iters: int = 0):
    def body(p, xs):
        s_t, v_t = xs
        p2, rec, ov, dem, cnt = pool_frame_step(p, s_t, v_t, g, opts,
                                                num_eps_iters)
        return p2, (rec, ov, dem, cnt)

    xs = (jnp.swapaxes(scores, 0, 1), jnp.swapaxes(frame_valid, 0, 1))
    new_pool, (recs, ovs, dems, cnts) = jax.lax.scan(body, pool, xs)
    return new_pool, recs, ovs, dems, cnts


@partial(jax.jit, static_argnames=("g", "opts", "num_eps_iters"))
def pool_decode_chunk(pool: PoolBeam, scores: jnp.ndarray,
                      frame_valid: jnp.ndarray, g: GraphArrays,
                      opts: DecoderOptions, num_eps_iters: int = 0):
    """Scan pool_frame_step over a chunk.

    scores (B, C, P), frame_valid (B, C).  Returns (pool', records with
    shapes (C, 2, Kp), overflow (C,) bools, demand (C,) int32 — per-frame
    true slot requirement, the schedule-learning telemetry — and maxcnt
    (C,) int32, the per-frame largest per-lane survivor count: maxcnt
    reaching the effective rank cap is the capacity-escalation signal)."""
    return _pool_decode_chunk_impl(pool, scores, frame_valid, g, opts,
                                   num_eps_iters)


@partial(jax.jit, static_argnames=("kp",))
def pool_from_beams(beam: Beam, kp: int) -> Tuple[PoolBeam, jnp.ndarray,
                                                  jnp.ndarray, jnp.ndarray]:
    """Pack per-lane (B, K) beams into a pool; returns (pool, origin,
    overflow, demand) where origin[p] = per-lane slot the pool token came
    from (-1 for dead) — the bridge from pooled records back into per-lane
    records — and demand is the GROUP-rounded slot requirement."""
    bsz, k = beam.state.shape
    lane = repeat_last(jnp.arange(bsz, dtype=jnp.int32), k)
    state = beam.state.reshape(-1)
    cost = beam.cost.reshape(-1)
    slot = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None],
                            (bsz, k)).reshape(-1)

    finite = jnp.isfinite(cost) & (state >= 0)
    s_lane = jnp.where(finite, lane, LANE_DEAD)
    pool, placed, overflow, demand, _cnt = _rank_and_place(
        s_lane, cost, state, (slot,), bsz, k, kp)
    origin = jnp.where(pool.state >= 0, placed[0], -1)
    return pool, origin, overflow, demand


def _pool_best_final_impl(pool: PoolBeam, g: GraphArrays, batch: int):
    safe = jnp.maximum(pool.state, 0)
    fin = jnp.where(pool.state >= 0, g.final[safe], jnp.inf)
    total = pool.cost + fin
    # per-lane min via masked broadcast (B, Kp) — Kp·B bools, fine off the
    # hot path (once per utterance batch).
    lanes = jnp.arange(batch, dtype=jnp.int32)
    masked = jnp.where(pool.lane[None, :] == lanes[:, None], total[None, :],
                       jnp.inf)
    slot = jnp.argmin(masked, axis=-1)
    best = jnp.take_along_axis(masked, slot[:, None], axis=1)[:, 0]
    best_fin = jnp.where(jnp.isinf(best), jnp.inf,
                         fin[slot])
    slot = jnp.where(jnp.isinf(best), -1, slot)
    return slot, best, best_fin


@partial(jax.jit, static_argnames=("g", "batch"))
def pool_best_final(pool: PoolBeam, g: GraphArrays, batch: int):
    """Per-lane argmin of cost + final(state) over the pool.

    Returns (slot (B,), total (B,), final (B,)); slot = -1 when the lane
    reached no final state."""
    return _pool_best_final_impl(pool, g, batch)


def pad_pool(pool: PoolBeam, new_kp: int) -> PoolBeam:
    """Widen a pool by appending dead tail slots (invariants preserved:
    GROUP alignment holds because new_kp is a GROUP multiple, live slot
    indices are unchanged so existing backpointers stay valid)."""
    extra = new_kp - pool.lane.shape[0]
    assert extra >= 0 and new_kp % GROUP == 0
    return PoolBeam(
        jnp.pad(pool.lane, (0, extra), constant_values=LANE_DEAD),
        jnp.pad(pool.state, (0, extra), constant_values=-1),
        jnp.pad(pool.cost, (0, extra), constant_values=np.inf))


@partial(jax.jit, static_argnames=("new_kp",))
def shrink_pool(pool: PoolBeam, new_kp: int
                ) -> Tuple[PoolBeam, jnp.ndarray]:
    """Drop the pool's dead tail down to ``new_kp`` slots.

    Returns (shrunk pool, ok) where ``ok`` is False when live tokens extend
    past ``new_kp`` — the shrink then produced an unusable pool and the
    caller must re-enter the chunk at the previous size (same lazy-flag
    protocol as overflow).  Live slot indices are unchanged, so records of
    later (narrower) frames still index correctly into earlier (wider)
    frames' record arrays during traceback."""
    ok = jnp.all(pool.lane[new_kp:] == LANE_DEAD)
    return PoolBeam(pool.lane[:new_kp], pool.state[:new_kp],
                    pool.cost[:new_kp]), ok


@jax.jit
def pool_traceback_chunk(slot: jnp.ndarray, rec: PoolRecord):
    """Walk one chunk's pooled records backwards for B walkers at once.

    slot: (B,) pool slots entering from the NEXT chunk; rec (C, G, Kp).
    Returns (slot', words (B, C, G)) — same contract as beam.traceback_chunk
    but the slot space is the pool."""
    c, gg, kp = rec.prev.shape
    prev = rec.prev.reshape(c * gg, kp)[::-1]
    word = rec.word.reshape(c * gg, kp)[::-1]

    def step(s, xs):
        p, w = xs
        sc = jnp.maximum(s, 0)
        return p[sc], w[sc]

    s, words_rev = jax.lax.scan(step, slot, (prev, word))
    return s, jnp.swapaxes(words_rev[::-1], 0, 1).reshape(-1, c, gg)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _round_group(x: int) -> int:
    return -(-int(x) // GROUP) * GROUP


# Pool-growth ladder ratio: each growth retry multiplies the pool by this
# factor (capped at the provable bound), so the number of DISTINCT compiled
# pool sizes per process is ceil(log4(cap / start)) + 1 — at most 4 for any
# realistic (batch, max_active).  Doubling (the round-2 scheme) compiled a
# fresh multi-minute program per step on this toolchain (VERDICT r2 weak #4).
LADDER_RATIO = 4

class ScheduleStore:
    """Learned pool-rung schedules persisted across processes.

    The in-memory ``_learned`` map evaporated per process (VERDICT r3 weak
    #6): every fresh process re-paid ladder retries — and their multi-minute
    tunneled compiles — on the first decode of each shape.  This store
    write-throughs the map to a JSON file next to the compile cache, keyed by
    (pack content hash, batch, n_slots, max_active, chunk), so a second
    process's first decode of a known shape runs retry-free.

    The file location comes from ``PKTPU_POOL_SCHEDULES`` (bench.py points it
    into the tracked ``bench_cache/``); unset → in-memory only, same as
    before.  Writes are atomic (tmp + rename) and last-writer-wins — the
    schedule is advisory (a stale one costs at most the ladder retries it
    was meant to skip), so no locking is needed.
    """

    def __init__(self, path: str = None):
        self.path = path or os.environ.get("PKTPU_POOL_SCHEDULES")
        self._data = None

    def _load(self) -> dict:
        if self._data is None:
            self._data = {}
            if self.path and os.path.exists(self.path):
                try:
                    with open(self.path) as fd:
                        self._data = json.load(fd)
                except (OSError, json.JSONDecodeError):
                    self._data = {}
        return self._data

    def get(self, key: str):
        return self._load().get(key)

    def put(self, key: str, schedule) -> None:
        data = self._load()
        schedule = [int(r) for r in schedule]
        if data.get(key) == schedule:
            return
        data[key] = schedule
        if not self.path:
            return
        try:
            tmp = f"{self.path}.{os.getpid()}.tmp"
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(tmp, "w") as fd:
                json.dump(data, fd, indent=0, sort_keys=True)
            os.replace(tmp, self.path)
        except OSError:
            pass                         # advisory cache — never fail a decode


# Length of the dedicated FIRST chunk.  Beam demand is not stationary: it
# explodes for the first ~8-16 frames of every utterance (from the start
# state the whole graph is reachable at near-uniform cost until the
# acoustics discriminate), and a batch decodes all lanes from frame 0
# TOGETHER, so the floods synchronize — measured pool demand on the bench
# pack is 425k slots at frame 5 vs ≤35k for mid-utterance chunks
# (scripts/probe_occupancy.py, B=32, K=16384).  The burst chunk therefore
# runs on the PER-LANE decoder (beam.decode_chunk at K=max_active): burst
# demand is per-lane-maximal, so pooling buys nothing there, and the
# batched (B, K) sorts are ~6x cheaper per element than one flat pool-wide
# sort (docs/PERFORMANCE.md r3 phase breakdown: 279 ms/frame as 8 looped
# 64k-slot group pools vs ~50 ms/frame per-lane).  Steady chunks then run
# on the shared pool at small learned rungs.
BURST_FRAMES = 16

# Post-burst decay chunk length: the first steady schedule slot covers only
# this many frames, so the beam→pool pack's crest-wide rung (the lanes exit
# the burst carrying up to max_active_cap tokens each) is priced over a few
# frames instead of a whole chunk_frames chunk while occupancy decays to
# steady state (see the chunk-layout comment in decode()).
POST_BURST_FRAMES = 8


class PooledViterbiDecoder:
    """Batched Viterbi decoder whose capacity is priced at OCCUPANCY.

    Drop-in alternative to ``decoder.ViterbiDecoder`` (same ``decode``
    signature and Hypothesis output; requires an eps-foldable graph).  One
    token pool of ``Kp`` slots is shared by all lanes: a lane may hold up to
    ``opts.max_active`` tokens during its burst frames while quiet lanes
    hold a few hundred, so the per-frame sort cost scales with the SUM of
    per-lane demands instead of ``B × max_active``.  Exactness: when no
    frame overflows the pool, the decode is token-for-token identical to the
    per-lane decoder at ``K = max_active`` (tests/test_pooled.py); on
    overflow the affected chunk is retried at the next pool-ladder rung
    (×LADDER_RATIO up to the provable cap — every retry size is a rung of a
    ≤4-step ladder, and the reached rung is carried into the next decode's
    starting size, so growth compiles each rung at most once per process) —
    results are never silently wrong.  The retry is detected LAZILY (per-chunk overflow
    flags are fetched once, after all chunks are enqueued) so the
    no-overflow fast path keeps the host→device pipeline full.

    ``pool_size``: initial pool slots (rounded up to GROUP); default
    ``max(B·1024, max_active + B·GROUP)`` — the bench pack's occupancy
    profile (median 243, p99 3.8k, rare >8k bursts; scripts/
    probe_occupancy.py) plus one full-size burst lane.  Growth is capped at
    ``B · roundup(max_active)``, where overflow is provably impossible.
    """

    def __init__(self, fst: Fst, tid2pdf: np.ndarray,
                 opts: DecoderOptions = DecoderOptions(),
                 pool_size: int = None):
        self.fst = fst
        self.opts = opts
        if pool_size is None:
            pool_size = opts.pool_size
        self.graph = GraphArrays.build(fst, tid2pdf, fold_eps=opts.fold_eps)
        # Unfoldable graphs (eps cycle through word-emitting paths, >2
        # words on a min-cost eps path, or fold blowup) run the SWEPT
        # fallback tier: per-frame pooled epsilon sweeps
        # (_pool_eps_sweep), a per-lane burst at the hard cap, and no
        # burst K-ramp.  The reference decodes any HCLG
        # (decoder.cc:186-221); losing the pooled tier for them was
        # VERDICT r4 missing #3.  Graphs with NO provable sweep bound
        # still error loudly in resolve_eps_iters.
        self.num_eps_iters, self.frame_eps_iters = resolve_eps_iters(
            self.graph, opts)
        # sortA's dedup key is lane·(S+1)+state in int32
        self._s_plus = int(fst.num_states) + 1
        self._max_batch = (INT_MAX - 1) // self._s_plus
        self.pool_size = pool_size
        # Capacity-escalation ceiling (VERDICT r4 next #1): opts.max_active
        # is the STARTING capacity rung; any chunk in which a lane's beam
        # fills re-runs at the next rung up to this hard cap, making the
        # decode provably identical to all-frames-at-hard-cap semantics.
        # hard == max_active → fixed-capacity semantics (the tested
        # pooled⇔per-lane equivalence contract).
        self._hard_cap = max(opts.max_active, opts.max_active_cap or 0)
        # telemetry of the most recent decode
        self.last_pool_size: int = 0       # largest rung used
        self.last_pool_growths: int = 0    # retries (growth or failed shrink)
        self.last_burst_retries: int = 0   # burst K-ramp segment retries
        self.last_cap_escalations: int = 0  # capacity rungs raised past K
        self.last_demand = None            # per-chunk max slot demand (np)
        # learned per-chunk rung schedule, keyed by (batch, n_chunks);
        # write-through persisted across processes (ScheduleStore)
        self._learned = {}
        # learned per-segment burst beam capacities, keyed by (batch, n_segs)
        self._learned_burst = {}
        # learned per-chunk capacity rungs (escalation outcomes)
        self._learned_caps = {}
        self._store = ScheduleStore()
        h = hashlib.sha1()
        h.update(np.int64([fst.num_states, fst.num_arcs,
                           fst.start_state]).tobytes())
        h.update(np.ascontiguousarray(fst.weight).tobytes())
        h.update(np.ascontiguousarray(fst.olabel).tobytes())
        self._pack_hash = h.hexdigest()[:16]
        # cached start-state closure per batch size: (device beam,
        # init_prev np, init_word np) — score-independent, so computed once
        self._init_cache = {}
        # opt-in phase profiling: set to a StageTimers to record per-phase
        # wall time WITH device syncs at phase boundaries (breaks dispatch
        # pipelining — diagnostics only, never enabled on the bench path)
        self.phase_timers = None

    # ------------------------------------------------------------------
    def _kp_cap(self, b: int) -> int:
        """Pool size at which per-lane caps make overflow impossible."""
        return b * _round_group(self._hard_cap)

    def _ladder(self, b: int):
        """The static rung set: every pool in this process is one of these,
        so compile count is bounded (VERDICT r2 weak #4).  Pinned pool_size
        anchors its own ×LADDER_RATIO ladder (test contract); auto mode uses
        occupancy-scaled rungs b·{512, 768, 1024, 1536, …} — a ×1.5/×2
        alternation whose sort lengths stay in the fast 2^k / 3·2^k
        families (sort cost depends on the length's FACTORIZATION —
        docs/PERFORMANCE.md r4 — and 16·b·512·2^j is 2^k for the usual
        power-of-two batches while the ×1.5 rungs give 3·2^k).  The finer
        ladder matters on tail-heavy demand: the bench's last chunk demands
        69.5k slots, and serving it at 3·32768=98304 instead of 131072 cuts
        that chunk's sort work 25%.  Only rungs a schedule actually uses
        ever compile."""
        cap = self._kp_cap(b)
        if self.pool_size is not None:
            rungs, kp = [], _round_group(self.pool_size)
            while kp < cap:
                rungs.append(kp)
                kp = _round_group(kp * LADDER_RATIO)
            return rungs + [cap]
        rungs = sorted({min(_round_group(b * m), cap)
                        for m in (384, 512, 768, 1024, 1536, 2048, 3072,
                                  4096, 6144, 8192)} | {cap})
        return rungs

    def _rung_for(self, demand: int, b: int) -> int:
        for r in self._ladder(b):
            if r >= demand:
                return r
        return self._kp_cap(b)

    def _next_rung(self, kp: int, b: int) -> int:
        for r in self._ladder(b):
            if r > kp:
                return r
        raise AssertionError("pool overflow at the provable-capacity bound")

    # -- burst K-ramp ---------------------------------------------------
    # Sub-chunk boundaries inside the burst: the flood is K-shaped in time
    # (per-lane demand ≤2k tokens on frames 0-3, the full cap on 4-9, ≤5k
    # decaying from 10 — scripts/probe_occupancy.py), so frames 0-3 and
    # 10-15 run at small learned capacities while only the flood crest pays
    # K = max_active.  THREE segments, not more: each extra segment is a
    # separate scanned program whose launch costs ~50-100 ms on a
    # tunnel-degraded host link (a 5-segment ramp measured the burst at
    # 916 ms vs 447 ms for this 3-segment one — docs/PERFORMANCE.md r4).
    # Boundaries are static; capacities are learned from measured occupancy
    # with a device-checked full-beam retry, so results stay exactly the
    # full-capacity decode's (tests/test_pooled.py).
    BURST_SEG_ENDS = (4, 10, 16)

    def _burst_ladder(self):
        hard = self._hard_cap
        rungs = {v for v in (512, 1024, 2048, 4096, 8192, 16384, 32768)
                 if v < hard}
        rungs.add(self.opts.max_active)
        rungs.add(hard)
        return sorted(rungs)

    def _cap_ladder(self):
        """Steady-chunk capacity rungs: max_active up to the hard cap."""
        k0, hard = self.opts.max_active, self._hard_cap
        mids = {v for v in (1024, 2048, 4096, 8192, 16384, 32768)
                if k0 < v < hard}
        return sorted({k0} | mids | {hard})

    def _next_cap(self, cap: int) -> int:
        for r in self._cap_ladder():
            if r > cap:
                return r
        raise AssertionError("capacity escalation past the hard cap")

    def _burst_plan(self, burst: int):
        ends, lo = [], 0
        for e in self.BURST_SEG_ENDS:
            e = min(e, burst)
            if e > lo:
                ends.append(e)
                lo = e
        if not ends or ends[-1] < burst:
            ends.append(burst)
        return ends

    def _burst_key(self, b: int, n_segs: int) -> str:
        return self._sched_key(b, 0) + f"|burst{n_segs}"

    def _burst_ks(self, b: int, n_segs: int):
        ks = self._learned_burst.get((b, n_segs))
        if ks is None:
            ks = self._store.get(self._burst_key(b, n_segs))
            ladder = self._burst_ladder()
            if ks is not None and (len(ks) != n_segs
                                   or not all(k in ladder for k in ks)):
                ks = None
        if ks is None:
            ks = [self.opts.max_active] * n_segs
        return list(ks)

    def _sched_key(self, b: int, n_slots: int) -> str:
        o = self.opts
        cap = "" if self._hard_cap == o.max_active else \
            f"|cap{self._hard_cap}"
        return (f"{self._pack_hash}|b{b}|s{n_slots}|k{o.max_active}"
                f"|c{o.chunk_frames}|p{self.pool_size or 0}{cap}")

    def _cap_schedule(self, b: int, n_slots: int):
        """Per-steady-chunk capacity rungs (learned, persisted like the
        pool-rung schedule): a chunk slot that escalated once stays at its
        learned capacity, so repeat decodes of the shape re-run nothing."""
        caps = self._learned_caps.get((b, n_slots))
        if caps is None:
            caps = self._store.get(self._sched_key(b, n_slots) + "|caps")
            ladder = self._cap_ladder()
            if caps is not None and (len(caps) != n_slots
                                     or not all(c in ladder for c in caps)):
                caps = None
        if caps is None:
            caps = [self.opts.max_active] * n_slots
        return list(caps)

    def _schedule(self, b: int, n_slots: int):
        """Per-steady-chunk pool rungs (slot 0 doubles as the group→pool
        merge target): the learned profile when one exists (in-memory, then
        the cross-process store), else a small occupancy-scaled default."""
        learned = self._learned.get((b, n_slots))
        if learned is None:
            learned = self._store.get(self._sched_key(b, n_slots))
            ladder = self._ladder(b)
            if learned is not None and not all(r in ladder for r in learned):
                learned = None           # stale store entry (ladder changed)
        if learned is not None:
            return list(learned)
        if self.pool_size is not None:
            return [self._ladder(b)[0]] * n_slots
        return [self._rung_for(b * 1024, b)] * n_slots

    # ------------------------------------------------------------------
    def decode(self, scores, num_frames=None):
        """Decode a batch — same contract as ViterbiDecoder.decode
        (ndarray (B, T, P) or callable ``scores_fn(lo, hi)`` + num_frames).
        """
        from .decoder import Hypothesis
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
        pt = self.phase_timers

        def _mark(name, t0, *arrays):
            if pt is None:
                return time.perf_counter()
            for a in arrays:
                jax.block_until_ready(a)
            now = time.perf_counter()
            pt.totals[name] += now - t0
            pt.counts[name] += 1
            return now

        t_phase = time.perf_counter()
        if b > self._max_batch:
            raise ValueError(
                f"batch {b} too large for this graph's pooled dedup key "
                f"(max {self._max_batch} lanes at {self._s_plus - 1} states)")

        # Init prologue on the host CPU backend (bit-identical; avoids
        # minutes of tunneled-TPU compile for one-shot K-wide sort programs
        # — see beam.init_beam_host); only the packed pools cross over.
        default = jax.devices()[0]
        cpu = default
        if default.platform != "cpu":
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = default
        g_init = self.graph if cpu is default else self.graph.cpu_mirror()

        # Chunk layout: a short BURST chunk on the PER-LANE decoder (burst
        # demand is per-lane-maximal, so the pool buys nothing there and
        # batched (B, K) sorts are far cheaper per element than flat
        # pool-wide sorts), then a short POST-BURST DECAY chunk, then
        # fixed-width steady chunks on ONE shared pool (the last padded to
        # full width with invalid frames, so chunk programs come in three
        # shapes regardless of T).
        #
        # The decay chunk is the whale fix for large batches (VERDICT r4
        # weak #2): the beam→pool pack must admit the burst exit's
        # crest-wide beams — at B=128 the learned pack rung is 196608
        # slots (1536/lane) while steady demand is 49152 (384/lane), and a
        # single slot-0 rung made ALL 64 first-chunk frames pay the pack
        # width: one chunk = 2.08 s of the 13.7 s batch, 4× its demand
        # price (scripts/trace_pool_chunk.py, r5).  Giving the first
        # POST_BURST_FRAMES frames their own schedule slot confines the
        # pack-width rung to the frames that actually need it — the same
        # demand-shaped-in-time trick as the burst K-ramp, one rung later.
        chunk = self.opts.chunk_frames
        burst = min(BURST_FRAMES, chunk, t)
        decay = POST_BURST_FRAMES if t > burst else 0
        rest0 = burst + decay
        n_rest = max(0, -(-(t - rest0) // chunk))
        steady_bounds = ([(burst, rest0)] if decay else []) + \
            [(rest0 + i * chunk, rest0 + (i + 1) * chunk)
             for i in range(n_rest)]
        n_slots = max(1, len(steady_bounds))
        schedule = self._schedule(b, n_slots)
        caps = self._cap_schedule(b, n_slots)
        growths = 0
        escalations = 0
        cap = self._hard_cap

        # Start beam + eps closure: score-independent, identical for every
        # decode of this batch size — computed once on the host CPU backend
        # (bit-identical; sidesteps minutes of tunneled-TPU compile AND
        # multi-second host execution per decode) and cached.
        cached = self._init_cache.get(b)
        if cached is None:
            with jax.default_device(cpu):
                beam0, init_rec = init_beam_batch(b, g_init, self.opts,
                                                  self.num_eps_iters)
            live0 = int(np.max(np.sum(np.asarray(beam0.state) >= 0,
                                      axis=-1)))
            if cpu is not default:
                beam0 = jax.device_put(beam0, default)
            cached = (beam0, np.asarray(init_rec.prev),
                      np.asarray(init_rec.word), live0)
            self._init_cache[b] = cached
        beam0, init_prev, init_word, live0 = cached
        t_phase = _mark("pool/init", t_phase, beam0)

        def padded_scores(lo, hi):
            hi_real = min(hi, t)
            sl = jnp.asarray(scores_fn(lo, hi_real))
            if hi_real < hi:                      # padded tail frames
                sl = jnp.pad(sl, ((0, 0), (0, hi - hi_real), (0, 0)))
            return sl

        def valid_of(lo, hi):
            return jnp.asarray(
                np.arange(lo, hi)[None, :] < num_frames[:, None])

        # Burst phase: batched per-lane sub-chunks at learned per-segment
        # capacity (K-ramp — see _burst_plan).  A lane cannot exceed its
        # segment's K by construction; a segment whose beam came back FULL
        # at K < max_active (or whose entering shrink would truncate live
        # tokens) retries one ladder rung up, so the result is always
        # identical to the all-frames-at-max_active burst (the tested
        # pooled⇔per-lane equivalence, tests/test_pooled.py).  Flags +
        # occupancy telemetry cross in ONE fetch per attempt.
        if not self.graph.folded:
            # Fallback burst for unfoldable graphs: ONE per-lane chunk at
            # the hard cap.  The K-ramp's device full-flag is only sound
            # for single-select (folded) frames, so no ramp — the burst is
            # ≤16 frames and this tier trades its cost for correctness.
            from .beam import decode_chunk
            k_hard = max(beam0.state.shape[-1], cap)
            bbeam = beam0 if beam0.state.shape[-1] == k_hard else \
                pad_beam(beam0, k_hard)
            o_hard = self.opts if k_hard == self.opts.max_active else \
                dataclasses.replace(self.opts, max_active=k_hard)
            bbeam, recs, ov = decode_chunk(
                bbeam, padded_scores(0, burst), valid_of(0, burst),
                self.graph, o_hard, self.frame_eps_iters)
            seg_recs = [recs]
            bovs = ov
            self.last_burst_retries = 0
            t_phase = _mark("pool/burst", t_phase, bbeam)
        else:
            seg_recs, bovs, bbeam, t_phase, escalations = self._burst_ramp(
                b, burst, beam0, live0, padded_scores, valid_of, cap,
                escalations, _mark, t_phase)
        return self._decode_tail(
            b, num_frames, schedule, caps, escalations, growths, n_slots,
            steady_bounds, seg_recs, bovs, bbeam, init_prev, init_word,
            pt, _mark, t_phase, padded_scores, valid_of, cap)

    # ------------------------------------------------------------------
    def _burst_ramp(self, b, burst, beam0, live0, padded_scores, valid_of,
                    cap, escalations, _mark, t_phase):
        """Folded-graph burst: batched per-lane sub-chunks at learned
        per-segment capacity (the K-ramp — see _burst_plan and the comment
        at the call site).  Returns (seg_recs, bovs, exit beam, t_phase,
        escalations)."""
        seg_ends = self._burst_plan(burst)
        n_segs = len(seg_ends)
        ks = self._burst_ks(b, n_segs)
        ladder = self._burst_ladder()
        burst_retries = 0
        while True:
            bbeam = beam0
            seg_recs, seg_ovs, flag_parts, occs, end_lives = \
                [], [], [], [], []
            lo = 0
            for s, hi in enumerate(seg_ends):
                k_s = ks[s]
                ok = None
                if bbeam.state.shape[-1] != k_s:
                    if k_s > bbeam.state.shape[-1]:
                        bbeam = pad_beam(bbeam, k_s)
                    else:
                        bbeam, ok = shrink_beam(bbeam, k_s)
                bbeam, recs, ov, full, occ = decode_chunk_k(
                    bbeam, padded_scores(lo, hi), valid_of(lo, hi),
                    self.graph, self.opts, self.num_eps_iters, k_s)
                seg_recs.append(recs)
                seg_ovs.append(ov)
                flag_parts.append(jnp.asarray(True) if ok is None else ok)
                flag_parts.append(jnp.any(full) if k_s < cap
                                  else jnp.asarray(False))
                occs.append(occ)
                # widest per-lane live extent EXITING this segment — the
                # width the NEXT segment's rung must admit at entry
                end_lives.append(jnp.max(jnp.sum(bbeam.state >= 0,
                                                 axis=-1)))
                lo = hi
            fetched = np.asarray(jnp.concatenate(
                [jnp.stack(flag_parts).astype(jnp.int32),
                 jnp.stack(occs).astype(jnp.int32),
                 jnp.stack(end_lives).astype(jnp.int32)]))
            ok_v = fetched[0:2 * n_segs:2].astype(bool)
            full_v = fetched[1:2 * n_segs:2].astype(bool)
            occ_v = fetched[2 * n_segs:3 * n_segs]
            end_v = fetched[3 * n_segs:]
            bad = np.nonzero(full_v | ~ok_v)[0]
            if bad.size == 0:
                break
            s0 = int(bad[0])
            burst_retries += 1
            if not ok_v[s0]:
                # entering shrink truncated: previous width always admits
                ks[s0] = ks[s0 - 1] if s0 else cap
            else:
                if ks[s0] >= self.opts.max_active:
                    # past the configured K: this retry IS the top-of-
                    # ladder capacity escalation toward the hard cap
                    escalations += 1
                ks[s0] = next(r for r in ladder if r > ks[s0])
        # Learn strictly-above-demand rungs so steady state never retries.
        # Demand for segment s = its own max occupancy AND the live width
        # ENTERING it (segment 0: the init closure; s > 0: segment s-1's
        # exit width) — without the entering term, a sharp occupancy decay
        # at a boundary learns a rung the entering shrink can never pass,
        # flip-flopping a full burst retry on EVERY subsequent decode while
        # re-learning the same too-small rung (the steady-chunk learner
        # guards this identically via enter_dem below).
        occ_list = [int(o) for o in occ_v]
        end_list = [int(e) for e in end_v]
        occ_list[0] = max(occ_list[0], live0)
        for s in range(1, n_segs):
            occ_list[s] = max(occ_list[s], end_list[s - 1])
        learned_ks = [next((r for r in ladder if r > o), cap)
                      for o in occ_list]
        self._learned_burst[(b, n_segs)] = learned_ks
        self._store.put(self._burst_key(b, n_segs), learned_ks)
        self.last_burst_retries = burst_retries
        bovs = jnp.concatenate(seg_ovs, axis=1)
        t_phase = _mark("pool/burst", t_phase, bbeam)
        return seg_recs, bovs, bbeam, t_phase, escalations

    # ------------------------------------------------------------------
    def _decode_tail(self, b, num_frames, schedule, caps, escalations,
                     growths, n_slots, steady_bounds, seg_recs, bovs,
                     bbeam, init_prev, init_word, pt, _mark, t_phase,
                     padded_scores, valid_of, cap):
        """Steady chunks + epilogue, shared by the folded and swept-
        fallback tiers (the burst phase differs; everything after the
        beam→pool pack is identical)."""
        from .decoder import Hypothesis

        def run_chunk(pool, lo, hi, cap_j):
            # cap_j > opts.max_active = an escalated capacity rung: the
            # SAME chunk program family, recompiled once per (kp, cap)
            # pair — value-equal frozen options hash equal, so repeats hit
            # the jit cache.
            o = self.opts if cap_j == self.opts.max_active else \
                dataclasses.replace(self.opts, max_active=cap_j)
            return pool_decode_chunk(pool, padded_scores(lo, hi),
                                     valid_of(lo, hi), self.graph, o,
                                     self.frame_eps_iters)

        def resize(pool, new_kp):
            cur = pool.lane.shape[0]
            if new_kp == cur:
                return pool, None
            if new_kp > cur:
                return pad_pool(pool, new_kp), None
            return shrink_pool(pool, new_kp)      # (pool, ok-flag on device)

        def do_pack(rung):
            return pool_from_beams(bbeam, rung)

        if self.opts.offload_records:
            return self._decode_offload(
                b, num_frames, schedule, caps, escalations, steady_bounds,
                seg_recs, bovs, run_chunk, resize, do_pack, init_prev,
                init_word)

        # Lazy flag protocol over the steady chunks: the beam→pool pack is
        # the resize ENTERING chunk 0; per-chunk overflow / failed-shrink
        # flags are fetched ONCE after everything is enqueued, and a bad
        # chunk re-runs at a corrected rung.  The no-retry fast path never
        # syncs mid-batch.
        merged, bridge, m_ov, m_dem = do_pack(schedule[0])
        t_phase = _mark("pool/merge", t_phase, merged)
        pool_in = [merged]   # pool entering steady chunk i
        pool_out = []        # pool exiting steady chunk i
        chunk_res = []       # (recs, ov_any, filled, dem_max, dem_last)
        enter_ok = [jnp.logical_not(m_ov)]
        while True:
            for i in range(len(chunk_res), len(steady_bounds)):
                p2, recs, ovs, dems, cnts = run_chunk(pool_in[i],
                                                      *steady_bounds[i],
                                                      caps[i])
                if pt is not None:
                    t_phase = _mark(
                        f"pool/steady{i}@{schedule[i]}", t_phase, p2)
                pool_out.append(p2)
                # Capacity-escalation signal: a lane's survivor count
                # reached the effective rank cap min(caps[i], kp) — exact
                # top-cap MAY have truncated tokens the hard cap would
                # keep.  At the hard cap the flag is meaningless (the cap
                # IS the semantics) and stays constant-False.
                thresh = min(caps[i], schedule[i])
                filled = (jnp.max(cnts) >= thresh) if thresh < cap \
                    else jnp.asarray(False)
                chunk_res.append((recs, jnp.any(ovs), filled,
                                  jnp.max(dems), dems[-1]))
                if i + 1 < len(steady_bounds):
                    nxt, ok = resize(p2, schedule[i + 1])
                    pool_in.append(nxt)
                    enter_ok.append(ok)
            # ONE flag fetch per retry round: entering-resize ok flags,
            # per-chunk overflow flags, and per-chunk filled flags cross
            # together (each extra round trip costs ~100 ms once a big
            # chunk program has run).
            nch = len(chunk_res)
            flags = np.asarray(jnp.stack(
                [jnp.asarray(True) if ok is None else ok
                 for ok in enter_ok]
                + [ov for _, ov, _, _, _ in chunk_res]
                + [fl for _, _, fl, _, _ in chunk_res]))
            ent = flags[:len(enter_ok)]
            ovf = np.zeros(len(ent), bool)
            fil = np.zeros(len(ent), bool)
            if chunk_res:
                ovf[:nch] = flags[len(enter_ok):len(enter_ok) + nch]
                fil[:nch] = flags[len(enter_ok) + nch:]
            bad = np.nonzero(ovf | ~ent | fil)[0]
            if bad.size == 0:
                t_phase = _mark("pool/flags", t_phase)
                break
            j = int(bad[0])
            if fil[j] and not ovf[j] and ent[j] and schedule[j] > caps[j]:
                # The rank cap was the binding constraint (pool had room):
                # raise the CAPACITY rung; the entering pool is unchanged,
                # so only this chunk and its downstream re-run.
                escalations += 1
                caps[j] = self._next_cap(caps[j])
                pool_in = pool_in[:j + 1]
                enter_ok = enter_ok[:j + 1]
            elif j == 0:
                # pack overflowed or chunk 0 did (or chunk 0 filled its
                # pool-bounded cap): redo the pack one rung up
                growths += 1
                schedule[0] = self._next_rung(schedule[0], b)
                merged, bridge, m_ov, m_dem = do_pack(schedule[0])
                pool_in = [merged]
                enter_ok = [jnp.logical_not(m_ov)]
            else:
                growths += 1
                if not ent[j]:
                    # entering shrink truncated live tokens: keep the
                    # previous chunk's (larger) rung for this chunk
                    schedule[j] = schedule[j - 1]
                else:
                    schedule[j] = self._next_rung(schedule[j], b)
                nxt, ok = resize(pool_out[j - 1], schedule[j])
                if ok is not None and not bool(np.asarray(ok)):
                    raise AssertionError(
                        "corrected rung still truncates live tokens")
                pool_in = pool_in[:j] + [nxt]
                enter_ok = enter_ok[:j] + [None]
            pool_out = pool_out[:j]
            chunk_res = chunk_res[:j]

        # --- one-fetch epilogue -------------------------------------------
        # A large pooled-chunk program leaves the tunneled device's
        # host<->device link latency-degraded (~100 ms per round trip;
        # docs/PERFORMANCE.md r3 sync-overhead note), so every epilogue
        # product — final selection, traceback word planes, overflow flags,
        # demand telemetry — is packed into ONE int32 vector on device and
        # crosses with a single transfer.
        final_pool = pool_out[-1] if pool_out else merged
        slot, total, fin = pool_best_final(final_pool, self.graph, b)
        t_phase = _mark("pool/best_final", t_phase)

        # Device traceback, newest chunk first: steady chunks, then ONE
        # crossing of the pack bridge into per-lane space, then the burst
        # chunk's per-lane records.  Only (B, C, 2) word planes cross to
        # the host.
        s = jnp.maximum(slot, 0)
        planes = []
        for recs, _, _, _, _ in reversed(chunk_res):
            s, words = pool_traceback_chunk(s, recs)
            planes.append(words)
        s0 = jnp.maximum(bridge[s], 0)          # pool slot → per-lane slot
        for recs in reversed(seg_recs):         # burst segments, newest first
            s0, bwords = traceback_chunk(s0, recs)
            planes.append(bwords)
        # flatten (B, C, G) → (B, C·G) per chunk before concatenating:
        # generation counts differ between burst and steady records on the
        # swept fallback tier (1+G per-lane vs 2+G pooled)
        plane_dev = jnp.concatenate(
            [p.reshape(p.shape[0], -1) for p in reversed(planes)], axis=1)
        t_phase = _mark("pool/traceback", t_phase)

        nrec = 1 + len(chunk_res)
        packed = jnp.concatenate([
            slot.astype(jnp.int32),
            jax.lax.bitcast_convert_type(total, jnp.int32),
            jax.lax.bitcast_convert_type(fin, jnp.int32),
            jnp.any(bovs, axis=1).astype(jnp.int32),
            s0.astype(jnp.int32),
            jnp.stack([m_dem] + [d for _, _, _, d, _ in chunk_res]
                      ).astype(jnp.int32),
            jnp.stack([m_dem] + [dl for _, _, _, _, dl in chunk_res]
                      ).astype(jnp.int32),
            plane_dev.reshape(-1).astype(jnp.int32),
        ])
        host = np.asarray(packed)
        t_phase = _mark("pool/fetch", t_phase)
        o = 0

        def take(n):
            nonlocal o
            out = host[o:o + n]
            o += n
            return out

        slot_np = take(b)
        total = take(b).view(np.float32)
        fin = take(b).view(np.float32)
        bov_np = take(b).astype(bool)
        s0_np = take(b)
        dem_stack = take(nrec).astype(np.int64)
        last_stack = take(nrec).astype(np.int64)
        plane = host[o:].reshape(b, -1)

        # Surface burst arc-expansion overflow (same policy as the per-lane
        # decoder: dropped arcs degrade accuracy; never silent).
        if bov_np.any():
            from ..utils import logging as pk_logging
            pk_logging.warn(
                "burst-chunk arc-expansion overflow on %d/%d utterances: "
                "arcs were dropped; raise DecoderOptions.expand_factor "
                "(current budget %d blocks)",
                int(bov_np.sum()), b, self.opts.expand_budget)

        # Telemetry + learned schedule for the next decode of this shape:
        # per slot, the smallest ladder rung covering its observed demand.
        # A learned rung below anything used so far costs ONE extra compile
        # on the next decode of this shape (bounded by the ladder size) and
        # then pays off on every decode after it; overflow retries still
        # correct any demand surprise.  Slot 0 covers the beam→pool pack
        # AND the first steady chunk.
        demands = np.empty(n_slots, np.int64)
        demands[0] = dem_stack[:2].max()
        demands[1:] = dem_stack[2:]
        self.last_demand = demands
        self.last_pool_size = max(schedule)
        self.last_pool_growths = growths
        self.last_cap_escalations = escalations
        # A slot's rung must also admit the live extent ENTERING it (the
        # previous chunk's last-frame demand) or the shrink into it would
        # truncate live tokens and flip-flop a retry on every decode.
        enter_dem = last_stack[:n_slots]        # entering slot i: i-1's last
        learned = [self._rung_for(int(max(dem, ent)), b)
                   for dem, ent in zip(demands, enter_dem)]
        self._learned[(b, n_slots)] = learned
        self._store.put(self._sched_key(b, n_slots), learned)
        # Escalated capacity rungs persist too: a chunk slot that once
        # needed the hard cap starts there next time — no re-run.
        self._learned_caps[(b, n_slots)] = list(caps)
        self._store.put(self._sched_key(b, n_slots) + "|caps", caps)

        out = []
        for i in range(b):
            if slot_np[i] < 0:
                out.append(Hypothesis([], 0.0, float("inf"),
                                      int(num_frames[i])))
                continue
            # the burst walk ended at this lane's init-record slot
            si = int(s0_np[i])
            words_init_rev = []
            for gen in range(init_prev.shape[1] - 1, -1, -1):
                w = int(init_word[i, gen, si])
                if w:
                    words_init_rev.append(w)
                si = int(init_prev[i, gen, si])
            flat = plane[i].reshape(-1)
            words = words_init_rev[::-1] + [int(w) for w in flat if w]
            weight = float(total[i])
            if self.opts.compat_double_final:
                weight += float(fin[i])
            out.append(Hypothesis(words, weight, float(total[i]),
                                  int(num_frames[i])))
        return out

    # ------------------------------------------------------------------
    def _decode_offload(self, b, num_frames, schedule, caps, escalations,
                        steady_bounds, seg_recs, bovs, run_chunk, resize,
                        do_pack, init_prev, init_word):
        """Long-audio pooled decode: records stream to the HOST per chunk.

        The device-resident path accumulates every steady chunk's
        (C, 2, Kp) record tensors in HBM until the epilogue traceback — for
        a 30-minute utterance that is O(T·Kp) backpointers, the same
        whole-utterance materialization the reference's decodable commits
        (src/decodable.cc:13-14) and SURVEY §5.7 forbids.  Here each chunk's
        records cross to the host as soon as the chunk's overflow flag is
        known (the flag fetch already synchronizes the transfer window), so
        live device memory is O(chunk): the current pool + one chunk's
        records + one chunk's scores.  The traceback then walks host numpy
        arrays, vectorized over the batch — identical slot arithmetic to
        ``pool_traceback_chunk``/``traceback_chunk``, oracle-pinned by
        tests/test_pooled_long_audio.py.

        Overflow/shrink handling is EAGER (retry before the next chunk
        starts) — the per-chunk host sync this costs is already paid by the
        record offload itself.
        """
        from .decoder import Hypothesis
        growths = 0
        n_slots = max(1, len(steady_bounds))

        # burst records → host; device copies die with this scope
        seg_host = [(np.array(r.prev), np.array(r.word)) for r in seg_recs]
        bov_np = np.asarray(jnp.any(bovs, axis=1)).astype(bool)

        host_recs = []          # per steady chunk: (prev, word) np arrays
        dem_max = []            # per steady chunk: max frame demand
        dem_last = []           # per steady chunk: last frame demand
        bridge_np = None
        m_dem_np = 0
        pool = None
        for i in range(len(steady_bounds)):
            while True:
                if i == 0:
                    merged, bridge, m_ov, m_dem = do_pack(schedule[0])
                    if bool(np.asarray(m_ov)):
                        schedule[0] = self._next_rung(schedule[0], b)
                        growths += 1
                        continue
                    entering = merged
                else:
                    entering, ok = resize(pool, schedule[i])
                    if ok is not None and not bool(np.asarray(ok)):
                        # shrink would truncate live tokens: keep prev rung
                        schedule[i] = schedule[i - 1]
                        growths += 1
                        continue
                p2, recs, ovs, dems, cnts = run_chunk(entering,
                                                      *steady_bounds[i],
                                                      caps[i])
                if bool(np.asarray(jnp.any(ovs))):
                    schedule[i] = self._next_rung(schedule[i], b)
                    growths += 1
                    continue
                # capacity-escalation check (same protocol as the device
                # path; eager here — the per-chunk sync is already paid by
                # the record offload itself)
                thresh = min(caps[i], schedule[i])
                if thresh < self._hard_cap and \
                        int(np.asarray(jnp.max(cnts))) >= thresh:
                    if schedule[i] <= caps[i]:
                        schedule[i] = self._next_rung(schedule[i], b)
                        growths += 1
                    else:
                        caps[i] = self._next_cap(caps[i])
                        escalations += 1
                    continue
                break
            if i == 0:
                bridge_np = np.array(bridge)
                m_dem_np = int(np.asarray(m_dem))
            pool = p2
            dems_np = np.asarray(dems)
            dem_max.append(int(dems_np.max()))
            dem_last.append(int(dems_np[-1]))
            host_recs.append((np.array(recs.prev), np.array(recs.word)))
            del recs, entering

        if pool is None:        # no steady chunks (t <= burst)
            while True:
                merged, bridge, m_ov, m_dem = do_pack(schedule[0])
                if not bool(np.asarray(m_ov)):
                    break
                schedule[0] = self._next_rung(schedule[0], b)
                growths += 1
            bridge_np = np.array(bridge)
            m_dem_np = int(np.asarray(m_dem))
            pool = merged

        slot, total, fin = pool_best_final(pool, self.graph, b)
        slot_np = np.asarray(slot)
        total_np = np.asarray(total)
        fin_np = np.asarray(fin)

        if bov_np.any():
            from ..utils import logging as pk_logging
            pk_logging.warn(
                "burst-chunk arc-expansion overflow on %d/%d utterances: "
                "arcs were dropped; raise DecoderOptions.expand_factor "
                "(current budget %d blocks)",
                int(bov_np.sum()), b, self.opts.expand_budget)

        # telemetry + learned schedule (same contract as the device path)
        demands = np.empty(n_slots, np.int64)
        demands[0] = max([m_dem_np] + dem_max[:1])
        demands[1:] = dem_max[1:]
        self.last_demand = demands
        self.last_pool_size = max(schedule)
        self.last_pool_growths = growths
        self.last_cap_escalations = escalations
        enter_dem = np.asarray([m_dem_np] + dem_last[:-1] if dem_last
                               else [m_dem_np])[:n_slots]
        learned = [self._rung_for(int(max(dem, ent)), b)
                   for dem, ent in zip(demands, enter_dem)]
        self._learned[(b, n_slots)] = learned
        self._store.put(self._sched_key(b, n_slots), learned)
        self._learned_caps[(b, n_slots)] = list(caps)
        self._store.put(self._sched_key(b, n_slots) + "|caps", caps)

        # ---- host traceback ------------------------------------------
        s = np.maximum(slot_np, 0).astype(np.int64)
        planes = []
        for prev, word in reversed(host_recs):
            c, gg, kp = prev.shape
            pr = prev.reshape(c * gg, kp)[::-1]
            wd = word.reshape(c * gg, kp)[::-1]
            ws = np.empty((c * gg, b), np.int32)
            for j in range(c * gg):
                ws[j] = wd[j][s]
                s = pr[j][s]
            planes.append(ws[::-1].T.reshape(b, c, gg))
        planes.reverse()

        s2 = np.maximum(bridge_np[s], 0).astype(np.int64)
        ar = np.arange(b)
        seg_words = []                  # per burst segment, oldest→newest
        for bp, bw in reversed(seg_host):
            bb, cc, g2, k2 = bp.shape
            # Per-lane burst StepRecords do NOT mask dead-slot prevs
            # (beam.select_beam keeps whatever payload rode the sort), so a
            # walker parked on a dead slot — e.g. a lane with no final state
            # clamped to slot 0 — can carry a prev up to the PREVIOUS
            # segment's k; entering a narrower segment that unmasked value
            # would fancy-index out of range and crash the whole batch (the
            # device path is immune only because jnp gathers clamp).  Clamp
            # at every segment boundary; dead walkers' words are discarded
            # by the slot_np[i] < 0 guard below, so any in-range slot is
            # equally correct for them.
            s2 = np.minimum(s2, k2 - 1)
            bpf = bp.reshape(bb, cc * g2, k2)
            bwf = bw.reshape(bb, cc * g2, k2)
            ws = np.empty((cc * g2, b), np.int32)
            for j in range(cc * g2 - 1, -1, -1):
                ws[j] = bwf[ar, j, s2]
                s2 = bpf[ar, j, s2]
            seg_words.append(ws)
        seg_words.reverse()
        bwords = np.concatenate(seg_words, axis=0) if seg_words else \
            np.zeros((0, b), np.int32)

        out = []
        for i in range(b):
            if slot_np[i] < 0:
                out.append(Hypothesis([], 0.0, float("inf"),
                                      int(num_frames[i])))
                continue
            si = int(s2[i])
            words_init_rev = []
            for gen in range(init_prev.shape[1] - 1, -1, -1):
                w = int(init_word[i, gen, si])
                if w:
                    words_init_rev.append(w)
                si = int(init_prev[i, gen, si])
            words = words_init_rev[::-1]
            words += [int(w) for w in bwords[:, i] if w]
            for plane in planes:
                words += [int(w) for w in plane[i].reshape(-1) if w]
            weight = float(total_np[i])
            if self.opts.compat_double_final:
                weight += float(fin_np[i])
            out.append(Hypothesis(words, weight, float(total_np[i]),
                                  int(num_frames[i])))
        return out
