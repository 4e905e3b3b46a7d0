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
  ProcessEmitting per-token arc loop       blocked arc tables: per-state arcs
    (decoder.cc:224-301)                     padded into (D=8)-arc blocks; a
                                             token expands by ROW-gathering
                                             its blocks (amortized gather)
  ProcessNonemitting work-list DFS         bounded epsilon sweeps (lax.scan)
    (decoder.cc:186-221)                     to the graph's eps-depth fixpoint
  OLabel GC'd cons-lists (pool.h:164-220)  per-generation backpointer records
                                             (prev_slot, word); device or host
                                             traceback — no GC needed

Why blocks: TPU gathers cost ~10ns *per index* regardless of payload, so the
natural CSR formulation (one gather per candidate arc ≈ 9 E-sized gathers per
frame) is gather-bound.  Padding each state's arcs into fixed 8-arc blocks
turns expansion into a handful of block-row gathers with E/8 indices and 128
bytes per row — per-index overhead amortized 32×.  Pad lanes carry weight=+∞
so they price themselves out of the beam with zero extra masking.

Shapes are static everywhere: K = beam capacity (max-active), EB = block
budget (expand_budget/8), G = epsilon sweeps per frame.  Empty beam slots
carry state = -1 / cost = +inf.  A frame step emits 1+G backpointer
"generations"; generation g maps slot k to (prev_slot in generation g-1,
word emitted on the arc).  Batch = a leading vmap axis; graph arrays are
closed over and replicated.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fst import Fst
from ..hparams import DecoderOptions

INT_MAX = np.iinfo(np.int32).max
BLOCK = 8  # default arcs per block (see _choose_block for the adaptive pick)

# Negative result (r5, scripts/probe_select_diet.py): a select_beam
# fast-path operand diet — (cost, state, iota) through the n-sort, payloads
# row-gathered for the 2K prefix, i.e. the pooled select's diet applied to
# the per-lane path — measured SLOWER at every crest shape (B=32, k·10
# candidates): 58.6 vs 53.6 ms/frame at k=20480, 112.8 vs 95.2 at 30720,
# 119.8 vs 101.0 at 32768.  Batched (B, n) sorts move payload operands
# cheaper than an m-row take_along_axis re-fetches them, matching the r1
# finding that payload-riding beats gather-afterwards ~2x.  The variant
# lives in git history (this comment's commit); do not re-try without new
# evidence.


def _choose_block(max_degree: int) -> int:
    """Pick the arc-block width for a graph's degree profile.

    Dense expansion fetches ``mb = ceil(max_degree / b)`` rows of ``b`` lanes
    per token, so the candidate count is K·mb·b and the gather index count is
    K·mb.  Minimize lanes first (drives score-lookup and sort sizes), then
    blocks (drives gather indices).  Width candidates are NOT restricted to
    powers of two: the bench graph's max folded degree is 10, and running
    10-wide blocks instead of 16 cut the pooled frame step's candidate
    count 37.5% for a measured 33.6 → 38.9 audio-s/s at exact parity
    (docs/PERFORMANCE.md r4 — sort cost tracks element count; the 10·2^k
    and 12·2^k length families run as fast as 2^k in context)."""
    best = None
    for b in (8, 10, 12, 16, 24, 32, 48, 64):
        mb = max(1, -(-max_degree // b))
        key = (mb * b, mb)
        if best is None or key < best[0]:
            best = (key, b)
    return best[1]


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


class ArcBlocks(NamedTuple):
    """Blocked arc table for one arc class (emitting or epsilon).

    blk_ptr: (S+1,) int32 — block range of state s is blk_ptr[s]..blk_ptr[s+1];
             an extra all-pad row sits at index NB (the "parking" row for
             out-of-budget block slots).
    packed:  (NB+1, P·BLOCK) int32 — per row, P BLOCK-wide planes stored
             FLAT: plane p occupies columns p·BLOCK..(p+1)·BLOCK.  Plane
             order is [next_state, pdf?, olabel, olabel2?, weight(bitcast
             f32)]: the pdf plane exists only for emitting arcs (has_pdf)
             and olabel2 only for eps-folded emitting arcs whose folded eps
             path can emit two words (has_ol2) — so eps rows carry 3 planes,
             plain emitting rows 4, folded emitting rows 5.  Skipping
             structurally-zero planes cuts row-gather bandwidth 20–40%.
             Flat rows matter: an XLA:TPU gather of (NB, P·B) rows runs ~6x
             faster than the same bytes as (NB, P, B) slices (measured 2.8 ms
             vs 16.7 ms for 196k row fetches — docs/PERFORMANCE.md).  Pad
             lanes have weight=+inf, next=0.
    max_blocks: int — max blocks any single state owns (static; sizing bound).
    """
    blk_ptr: jnp.ndarray
    packed: jnp.ndarray
    max_blocks: int
    has_pdf: bool = True
    has_ol2: bool = False

    @property
    def num_planes(self) -> int:
        # [next, olabel, weight] always; + pdf and/or olabel2
        return 3 + int(self.has_pdf) + int(self.has_ol2)

    @property
    def block(self) -> int:
        return int(self.packed.shape[-1]) // self.num_planes


def _build_blocks(num_states: int, arc_src: np.ndarray, nxt: np.ndarray,
                  pdf: np.ndarray, olabel: np.ndarray,
                  weight: np.ndarray, olabel2: np.ndarray = None,
                  block: int = None, with_pdf: bool = True) -> ArcBlocks:
    """Pack one arc class (arrays already sorted by source state) into blocks."""
    counts = np.bincount(arc_src, minlength=num_states) \
        if arc_src.size else np.zeros(num_states, dtype=np.int64)
    if block is None:
        block = _choose_block(int(counts.max()) if counts.size else 1)
    blk_counts = -(-counts // block)                       # ceil-div
    blk_ptr = np.zeros(num_states + 1, dtype=np.int32)
    np.cumsum(blk_counts, out=blk_ptr[1:])
    nb = int(blk_ptr[-1])

    planes = [nxt] + ([pdf] if with_pdf else []) + [olabel] + \
        ([olabel2] if olabel2 is not None else [])
    num_planes = len(planes) + 1                           # + weight plane
    packed = np.zeros((nb + 1, num_planes, block), dtype=np.int32)
    inf_bits = np.float32(np.inf).view(np.int32)
    packed[:, -1, :] = inf_bits                            # weight = +inf pad
    if arc_src.size:
        arc_ptr = np.zeros(num_states + 1, dtype=np.int64)
        np.cumsum(counts, out=arc_ptr[1:])
        local = np.arange(arc_src.size, dtype=np.int64) - arc_ptr[arc_src]
        row = blk_ptr[arc_src] + (local // block)
        col = local % block
        for p, vals in enumerate(planes):
            packed[row, p, col] = vals
        packed[row, -1, col] = weight.astype(np.float32).view(np.int32)
    return ArcBlocks(
        blk_ptr=jnp.asarray(blk_ptr),
        packed=jnp.asarray(packed.reshape(nb + 1, num_planes * block)),
        max_blocks=int(blk_counts.max()) if num_states else 0,
        has_pdf=with_pdf,
        has_ol2=olabel2 is not None,
    )


@dataclasses.dataclass(frozen=True)
class GraphArrays:
    """Device-resident blocked views of the decoding graph.

    Emitting arcs carry a precomputed pdf id (tid2pdf applied at load —
    replaces the per-arc ``TransitionIdToPdfId`` lookup, decodable.cc:24-31).

    ``folded`` — epsilon-removal applied: every emitting arc is composed
    with the min-cost epsilon closure of its destination (extra arcs with
    summed weights and up to two word labels), so the per-frame decode needs
    NO epsilon sweeps.  Equivalence is exact on the candidate set: Viterbi
    only ever takes the min-cost eps path (any other loses at token dedup),
    and the closure successors appear as ordinary candidates of the same
    frame with identical costs.  Under a tight ``max_active`` the folded
    single select prunes over a LARGER candidate pool (emitting destinations
    plus all closure successors at once) than the swept two-stage select, so
    capacity-limited pruning order — hence the 1-best at capacity — may
    differ between the two paths; this is the same approximation class as
    beam pruning itself, and disappears whenever K covers the in-beam
    states.  The eps blocks are still used for the start-state closure
    (init_beam).
    """
    emit: ArcBlocks
    eps: ArcBlocks
    final: jnp.ndarray        # (S,)
    start_state: int
    eps_depth: int
    folded: bool = False
    # True when eps_depth is a converged longest-chain measurement (the eps
    # sub-graph is chain-bounded); False means the measurement hit its cap —
    # an eps cycle or a pathologically deep chain (Fst.eps_depth_bounded).
    eps_bounded: bool = True
    # Extension sweeps Fst.eps_closure needed to reach its fixpoint (only
    # meaningful when folded): every min-cost eps path has ≤ closure_sweeps+1
    # edges, so closure_sweeps+1 relaxation sweeps close ANY token set —
    # init_beam's start-state closure uses this even when eps_depth is
    # unbounded (cyclic graphs; cycles never improve a nonnegative closure).
    closure_sweeps: int = 0
    # Largest output label in the graph (static): lets the pooled select
    # pack (word, word2) into one int32 sort payload when both fit 15 bits.
    max_olabel: int = INT_MAX

    # Folding is rejected if it would grow the emitting arc table by more
    # than this factor (pathological closure fan-out).
    FOLD_MAX_BLOWUP = 3.0

    @classmethod
    def build(cls, fst: Fst, tid2pdf: np.ndarray,
              fold_eps: bool = None) -> "GraphArrays":
        tid2pdf = np.asarray(tid2pdf, dtype=np.int32)
        s = fst.num_states
        src = fst.arc_source

        is_emit = fst.ilabel != 0
        emit_idx = np.nonzero(is_emit)[0]
        eps_idx = np.nonzero(~is_emit)[0]
        e_src = src[emit_idx]
        e_nxt = fst.next_state[emit_idx]
        e_pdf = tid2pdf[fst.ilabel[emit_idx]]
        e_ol = fst.olabel[emit_idx]
        e_w = fst.weight[emit_idx]
        e_ol2 = None

        folded = False
        if fold_eps is None or fold_eps:
            fold = _fold_closure(fst, e_src, e_nxt, e_pdf, e_ol, e_w,
                                 cls.FOLD_MAX_BLOWUP)
            if fold is not None:
                e_src, e_nxt, e_pdf, e_ol, e_ol2, e_w = fold
                folded = True
            elif fold_eps:
                raise ValueError(
                    "fold_eps=True but the graph's epsilon closure is not "
                    "foldable (eps cycle, >2 words on a min-cost eps path, "
                    "or arc blowup)")

        import os as _os
        blk_override = None
        raw = _os.environ.get("PKTPU_EMIT_BLOCK", "")
        if raw:
            # Validate before it reaches block packing: a malformed or
            # out-of-range override would otherwise raise a bare ValueError
            # (or build nonsensical blocks) deep inside _build_blocks.
            # Invalid values are ignored with a warning — an env knob must
            # never turn a working decode into a crash.
            try:
                v = int(raw)
            except ValueError:
                v = -1
            if 1 <= v <= 1024:
                blk_override = v
            else:
                from ..utils import logging as pk_logging
                pk_logging.warn(
                    "ignoring invalid PKTPU_EMIT_BLOCK=%r "
                    "(expected an integer in [1, 1024])", raw)
        emit = _build_blocks(s, e_src, e_nxt, e_pdf, e_ol, e_w, e_ol2,
                             block=blk_override)
        eps = _build_blocks(
            s, src[eps_idx], fst.next_state[eps_idx], None,
            fst.olabel[eps_idx], fst.weight[eps_idx], with_pdf=False)
        closure_sweeps = int(fst.eps_closure["sweeps"]) if folded else 0
        max_ol = int(max(int(fst.olabel.max()) if fst.olabel.size else 0,
                         int(e_ol.max()) if e_ol.size else 0,
                         int(e_ol2.max()) if e_ol2 is not None
                         and e_ol2.size else 0))
        return cls(emit=emit, eps=eps, final=jnp.asarray(fst.final),
                   start_state=int(fst.start_state),
                   eps_depth=int(fst.eps_depth), folded=folded,
                   eps_bounded=bool(fst.eps_depth_bounded),
                   closure_sweeps=closure_sweeps, max_olabel=max_ol)

    # Make hashable-by-identity so jitted functions can close over it.
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def cpu_mirror(self) -> "GraphArrays":
        """A copy of this graph with arrays resident on the host CPU backend.

        One-shot prologue programs (init eps-closure, beam→pool packing) are
        tiny amounts of work but compile into LARGE sort programs; on a
        tunneled TPU toolchain that compile costs MINUTES (the r2 bench died
        in it) while XLA:CPU compiles the same program locally in seconds.
        Running the prologue on the host backend and transferring the (small)
        resulting beam is bit-identical: the path is gathers + stable sorts +
        f32 adds, all IEEE-exact on both backends.  Cached per graph.
        """
        mirror = getattr(self, "_cpu_mirror", None)
        if mirror is None:
            cpu = jax.devices("cpu")[0]

            def move(x):
                return jax.device_put(np.asarray(x), cpu)

            mirror = dataclasses.replace(
                self,
                emit=self.emit._replace(blk_ptr=move(self.emit.blk_ptr),
                                        packed=move(self.emit.packed)),
                eps=self.eps._replace(blk_ptr=move(self.eps.blk_ptr),
                                      packed=move(self.eps.packed)),
                final=move(self.final))
            object.__setattr__(self, "_cpu_mirror", mirror)
        return mirror


def resolve_eps_iters(graph: GraphArrays,
                      opts: DecoderOptions) -> Tuple[int, int]:
    """Epsilon-sweep counts: (init-closure sweeps, per-frame sweeps).

    Replaces the reference's run-to-fixpoint work-list (decoder.cc:186-221)
    with an exact static bound — and refuses, loudly, when no bound exists:

      * explicit ``opts.max_eps_iters`` — caller's responsibility;
      * folded graph — 0 per-frame sweeps; the init closure needs
        ``closure_sweeps + 1`` relaxation sweeps (every min-cost eps path
        has that many edges at most, even on cyclic graphs);
      * chain-bounded graph — ``eps_depth`` sweeps finalize all shortest
        eps paths of ≤ depth edges (Bellman-Ford over the eps DAG);
      * otherwise (eps cycle / unmeasurably deep chain, unfolded) —
        a hard load-time error.  Silently clamping here decodes WRONG on
        graphs deeper than the clamp.
    """
    if opts.max_eps_iters is not None:
        n = opts.max_eps_iters
        return n, (0 if graph.folded else n)
    if graph.folded:
        return max(1, graph.closure_sweeps + 1), 0
    if not graph.eps_bounded:
        from ..errors import PkRuntimeError
        raise PkRuntimeError(
            "the decoding graph's epsilon sub-graph has a cycle or an "
            "unmeasurably deep chain, and epsilon folding is off/"
            "infeasible: no sweep count is provably sufficient. Set "
            "DecoderOptions.max_eps_iters explicitly (unsafe) or enable "
            "fold_eps.")
    return max(1, graph.eps_depth), max(1, graph.eps_depth)


def _fold_closure(fst: Fst, e_src, e_nxt, e_pdf, e_ol, e_w, max_blowup):
    """Compose emitting arcs with the eps closure of their destinations.

    Returns (src, nxt, pdf, ol, ol2, w) folded arrays sorted by src, or None
    when folding is infeasible (see Fst.eps_closure) or would blow up the
    arc table by more than ``max_blowup``.
    """
    clo = fst.eps_closure
    if clo is None:
        return None
    if clo["src"].size == 0:
        return None if e_src.size == 0 else \
            (e_src, e_nxt, e_pdf, e_ol, np.zeros_like(e_ol), e_w)

    c_order = np.argsort(clo["src"], kind="stable")
    c_src = clo["src"][c_order]
    c_dst = clo["dst"][c_order]
    c_cost = clo["cost"][c_order]
    c_w1 = clo["w1"][c_order]
    c_w2 = clo["w2"][c_order]
    c_n = clo["nwords"][c_order]

    lo = np.searchsorted(c_src, e_nxt, side="left")
    hi = np.searchsorted(c_src, e_nxt, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    if e_src.size and (e_src.size + total) > max_blowup * e_src.size:
        return None
    rep = np.repeat(np.arange(e_src.size), cnt)
    flat = (np.repeat(lo, cnt) +
            (np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)))

    arc_has = e_ol[rep] != 0
    # words on the folded arc = arc word then closure words, capacity 2
    n_total = arc_has.astype(np.int32) + c_n[flat]
    if n_total.size and int(n_total.max()) > 2:
        return None
    f_ol = np.where(arc_has, e_ol[rep], c_w1[flat]).astype(np.int32)
    f_ol2 = np.where(arc_has, c_w1[flat], c_w2[flat]).astype(np.int32)

    src = np.concatenate([e_src, e_src[rep]])
    nxt = np.concatenate([e_nxt, c_dst[flat]])
    pdf = np.concatenate([e_pdf, e_pdf[rep]])
    ol = np.concatenate([e_ol, f_ol])
    ol2 = np.concatenate([np.zeros_like(e_ol), f_ol2])
    w = np.concatenate([e_w, e_w[rep] + c_cost[flat]]).astype(np.float32)
    order = np.argsort(src, kind="stable")
    return (src[order], nxt[order], pdf[order], ol[order], ol2[order],
            w[order])


# ---------------------------------------------------------------------------
# Core primitives
# ---------------------------------------------------------------------------

def _cumsum_mxu(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive int32 cumsum via two-level 128-wide triangular matmuls.

    XLA's TPU cumsum lowers to a slow log-shift chain (~ms at K=2048).  Here:
    reshape to (K/128, 128) rows, run each row through a 128×128 triangular
    matmul on the MXU (tiny constant), then carry row totals with a short
    cumsum.  Exact in f32 for sums < 2^24 (block counts are far below that).
    """
    k = x.shape[-1]
    c = 128
    if k < 2 * c or k % c != 0:
        return jnp.cumsum(x)
    xr = x.reshape(k // c, c).astype(jnp.float32)
    triu = jnp.triu(jnp.ones((c, c), jnp.float32))     # M[l,j]=1 for l<=j
    within = jnp.dot(xr, triu, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    row_tot = within[:, -1]
    carry = jnp.concatenate([jnp.zeros(1, jnp.float32),
                             jnp.cumsum(row_tot)[:-1]])
    return (within + carry[:, None]).reshape(k).astype(x.dtype)


# Below this many indices a plain gather beats the one-hot matmul setup.
SCORE_ONEHOT_MIN = 4096


def lookup_scores_onehot(scores_t: jnp.ndarray,
                         pdf: jnp.ndarray) -> jnp.ndarray:
    """``scores_t[pdf]`` via factorized one-hot matmuls on the MXU — always.

    EXACT in f32: every dot product has exactly one nonzero term
    (1.0 * score), so no rounding is introduced (hence HIGHEST precision —
    default TPU precision truncates to bf16, max err ~1e-2).  Use directly
    (instead of ``lookup_scores``) when the call sits under ``vmap`` and the
    per-call index count is below SCORE_ONEHOT_MIN but the *batched* count is
    not — the size heuristic must see the total (pooled decoder's grouped
    lookup).
    """
    shape = pdf.shape
    n = 1
    for d in shape:
        n *= int(d)
    p = scores_t.shape[-1]
    c = 128
    r = -(-p // c)
    table = jnp.pad(scores_t, (0, r * c - p)).reshape(r, c)
    idx = pdf.reshape(n)
    oh_col = jax.nn.one_hot(idx % c, c, dtype=jnp.float32)
    t1 = jnp.einsum("nc,rc->nr", oh_col, table,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    oh_row = jax.nn.one_hot(idx // c, r, dtype=jnp.float32)
    return jnp.sum(t1 * oh_row, axis=-1).reshape(shape)


def lookup_scores(scores_t: jnp.ndarray, pdf: jnp.ndarray) -> jnp.ndarray:
    """``scores_t[pdf]`` via factorized one-hot matmuls on the MXU.

    XLA:TPU gathers cost ~13 ns *per index*; at K=8192 the per-arc pdf
    lookup is ~2M indices per frame across the batch (measured 22.6 ms).
    Factorizing the index as (row, col) = (pdf // 128, pdf % 128) turns the
    lookup into a column one-hot (N, 128) matmul against the score table
    reshaped (R, 128), followed by a row-select mask — 3.1 ms for the same
    lookup (7.3x).  Below SCORE_ONEHOT_MIN indices a plain gather wins.
    Pallas equivalents measured slower (small-matmul bound) or failed to
    compile on this toolchain; see docs/PERFORMANCE.md.
    """
    n = 1
    for d in pdf.shape:
        n *= int(d)
    if n < SCORE_ONEHOT_MIN:
        return scores_t[pdf]
    return lookup_scores_onehot(scores_t, pdf)


def _split_planes(rows: jnp.ndarray, blocks: ArcBlocks):
    """Flat (…, P·BLOCK) rows → (nxt, pdf, olabel, olabel2, weight).

    pdf / olabel2 are ``None`` when the arc class doesn't carry that plane
    (eps rows have no pdf; only folded emitting rows have olabel2)."""
    block = blocks.block

    def plane(p):
        return rows[..., p * block:(p + 1) * block]

    nxt = plane(0)
    p = 1
    pdf = None
    if blocks.has_pdf:
        pdf, p = plane(p), p + 1
    olabel, p = plane(p), p + 1
    olabel2 = None
    if blocks.has_ol2:
        olabel2, p = plane(p), p + 1
    weight = jax.lax.bitcast_convert_type(plane(p), jnp.float32)
    return nxt, pdf, olabel, olabel2, weight


def repeat_last(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """``jnp.repeat(x, r, axis=-1)`` for a SCALAR repeat count, as a
    broadcast + reshape.

    jnp.repeat's generic lowering emits a full-size GATHER even for scalar
    repeats — op-level tracing of the pooled frame step found three such
    repeats costing 3-4.5 ms each at 524k elements (~55% of the whole
    step; docs/PERFORMANCE.md r3).  The broadcast form is a contiguous
    copy XLA fuses into consumers."""
    if r == 1:
        return x
    return jnp.broadcast_to(x[..., None], x.shape + (r,)).reshape(
        x.shape[:-1] + (x.shape[-1] * r,))


def expand_dense(states: jnp.ndarray, costs: jnp.ndarray,
                 slots: jnp.ndarray, blocks: ArcBlocks):
    """Dense per-token expansion: every token reads its ``max_blocks`` rows.

    blk[k, j] = blk_ptr[state_k] + j (parked on the pad row past the state's
    count), so the only data-dependent op is ONE flat row gather of
    K·max_blocks indices — no prefix sums, no searchsorted, no per-candidate
    token gathers (searchsorted alone costs ~8 ms at this scale on TPU).
    Used when ``max_blocks`` is small; graphs with high-degree states fall
    back to the flat path below.  Batch-agnostic: states/costs/slots may
    carry leading batch dims; outputs are (…, K·mb, BLOCK) / (…, K·mb).
    Dense expansion covers every arc of every token by construction, so the
    overflow flag it returns is constant-False.
    """
    k = states.shape[-1]
    mb = max(1, blocks.max_blocks)
    nb = blocks.packed.shape[0] - 1
    width = blocks.packed.shape[-1]
    safe = jnp.maximum(states, 0)
    start = blocks.blk_ptr[safe]
    cnt = jnp.where(states < 0, 0, blocks.blk_ptr[safe + 1] - start)
    j = jnp.arange(mb, dtype=jnp.int32)
    blk = jnp.where(j < cnt[..., None], start[..., None] + j, nb)
    rows = blocks.packed[blk.reshape(-1)]        # (∏lead·K·mb, P·BLOCK)
    rows = rows.reshape(states.shape[:-1] + (k * mb, width))
    nxt, pdf, olabel, olabel2, weight = _split_planes(rows, blocks)
    tok_cost = repeat_last(costs, mb)
    tok_slot = repeat_last(slots, mb)
    overflow = jnp.zeros(states.shape[:-1], bool)
    return nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, overflow


def expand_blocks(states: jnp.ndarray, costs: jnp.ndarray,
                  slots: jnp.ndarray, blocks: ArcBlocks, eb: int):
    """Expand each token's arc blocks into flat candidate arrays.

    states/costs/slots: (K,) token arrays (slots = backpointer slot ids).
    eb: static block budget.  Returns (next, pdf, olabel, weight, cand_cost
    base prep) pieces as (EB, BLOCK) arrays plus per-candidate token info
    and an ``overflow`` bool scalar.

    If the true block total exceeds ``eb`` the *last* tokens lose arcs —
    callers order tokens best-first when overflow is possible — and
    ``overflow`` comes back True so the truncation is never silent (the
    dedup path's exactness is device-guarded; this guards expansion the
    same way).
    """
    k = states.shape[0]
    nb = blocks.packed.shape[0] - 1          # index of the all-pad row
    safe = jnp.maximum(states, 0)
    start = blocks.blk_ptr[safe]
    cnt = jnp.where(states < 0, 0, blocks.blk_ptr[safe + 1] - start)
    offsets = _cumsum_mxu(cnt)
    shifted = jnp.concatenate([jnp.zeros(1, offsets.dtype), offsets[:-1]])
    total = offsets[-1]

    e = jnp.arange(eb, dtype=jnp.int32)
    tok = jnp.searchsorted(offsets, e, side="right").astype(jnp.int32)
    tok = jnp.minimum(tok, k - 1)

    # Pack per-token values and fetch them with ONE row-gather each.
    tok_i32 = jnp.stack([start, shifted], axis=1)          # (K, 2)
    tok_f32 = jnp.stack([costs, slots.astype(jnp.float32)], axis=1)
    g_i = tok_i32[tok]                                     # (EB, 2)
    g_f = tok_f32[tok]                                     # (EB, 2)
    blk = g_i[:, 0] + (e - g_i[:, 1])
    valid = e < jnp.minimum(total, eb)
    blk = jnp.where(valid, blk, nb)                        # park on pad row

    rows = blocks.packed[blk]                              # (EB, P·BLOCK)
    nxt, pdf, olabel, olabel2, weight = _split_planes(rows, blocks)

    tok_cost = g_f[:, 0]                                   # (EB,)
    tok_slot = g_f[:, 1].astype(jnp.int32)                 # (EB,)
    return nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, total > eb


def _first_of_run(s_state: jnp.ndarray) -> jnp.ndarray:
    lead = s_state.shape[:-1]
    return jnp.concatenate(
        [jnp.ones(lead + (1,), bool), s_state[..., 1:] != s_state[..., :-1]],
        axis=-1)


def _dedup_select(state_key, cost, payloads, k):
    """Exact dedup-by-state keep-min + top-K, payloads riding the sorts.

    sortA by (state, cost) stable → first-of-run mask kills duplicate states
    (keeping the min-cost / earliest occurrence) → sortB by cost stable →
    slice K.  No per-index gathers: payload operands move through the sort
    network vectorized, which beats the gather-afterwards formulation ~2x at
    bench scale (docs/PERFORMANCE.md).
    """
    s = jax.lax.sort((state_key, cost) + payloads, num_keys=2,
                     is_stable=True)
    s_state, s_cost = s[0], s[1]
    s_cost = jnp.where(_first_of_run(s_state), s_cost, jnp.inf)
    o = jax.lax.sort((s_cost, s_state) + s[2:], num_keys=1, is_stable=True)
    return tuple(a[..., :k] for a in o)


def select_beam(state: jnp.ndarray, cost: jnp.ndarray, prev: jnp.ndarray,
                word: jnp.ndarray, k: int, beam_width: jnp.ndarray,
                word2: jnp.ndarray = None, return_exact: bool = False):
    """Dedup-by-state (keep min cost) + beam prune + exact top-K.

    Replaces HashTable insert-min (decoder.cc:99-130) with sort-based
    dedup (stable (state, cost) sort + first-of-run mask) and the sampled
    cutoff (decoder.cc:132-182) with an exact top-K.  Stability preserves the
    reference's keep-existing-on-tie semantics when callers order existing
    tokens before new candidates.  Batch-agnostic: all arrays may carry
    leading batch dims (sorts run along the last axis).

    Fast path (N > 4K): ONE cost sort of N with payloads riding, then dedup
    only the first M=2K candidates — exact whenever the prefix holds ≥ K
    distinct states (scanning cost-ascending, each new distinct state is the
    next-best unique token, so ≥ K distinct states in the prefix ⇒ the true
    top-K deduped beam is inside it) or the prefix holds every finite
    candidate.  The guard is checked on device; a ``lax.cond`` falls back to
    the full-N dedup when it fails (early frames / tiny beams).  NOTE: the
    cond is a real branch only when NOT vmapped — callers batch via leading
    axes, never ``jax.vmap``, or the fallback runs every frame.
    """
    n = state.shape[-1]
    best = jnp.min(cost, axis=-1, keepdims=True)
    cost = jnp.where(cost <= best + beam_width, cost, jnp.inf)
    state_key = jnp.where(jnp.isinf(cost), INT_MAX, state)
    payloads = (prev, word) if word2 is None else (prev, word, word2)

    # return_exact=True additionally returns the fast-path guard flag
    # (True = the prefix path was exact / no fast path exists) so DEBUG
    # programs can pin when the whole-batch full-N fallback fires (VERDICT
    # r4 weak #3).  Production callers leave it False — the flag is an
    # extra output, so the default HLO is unchanged.
    exact = jnp.asarray(True)
    m = 2 * k
    if n <= 2 * m:
        out = _dedup_select(state_key, cost, payloads, k)
    else:
        o = jax.lax.sort((cost, state_key) + payloads, num_keys=1,
                         is_stable=True)
        finite_total = jnp.sum(jnp.isfinite(o[0][..., :m + 1]), axis=-1)
        pre = tuple(a[..., :m] for a in o)
        q = jax.lax.sort((pre[1], pre[0]) + pre[2:], num_keys=2,
                         is_stable=True)
        uniq = _first_of_run(q[0]) & jnp.isfinite(q[1])
        u = jnp.sum(uniq, axis=-1)
        # exact if the prefix holds ≥ K distinct states, or holds every
        # finite candidate (finite_total counted over m+1 detects overflow).
        # NOTE jnp.all couples the whole batch: lax.cond needs a scalar
        # predicate, so ONE lane failing the guard sends EVERY lane through
        # the full-N dedup for this frame — correct, but a whole-batch perf
        # cliff on frames where any lane's beam is still tiny.  Mask-merging
        # per-lane results would decouple lanes at the cost of running both
        # paths every frame; profiles show the fallback fires only on the
        # first few frames, so the scalar guard wins.
        exact = jnp.all((u >= k) | (finite_total <= m))

        def prefix_path(_):
            qc = jnp.where(uniq, q[1], jnp.inf)
            r = jax.lax.sort((qc, q[0]) + q[2:], num_keys=1, is_stable=True)
            return tuple(a[..., :k] for a in r)

        def full_path(_):
            # o is cost-sorted but _dedup_select re-sorts by (state, cost);
            # stability keeps cost-ascending order within each state run, so
            # first-of-run still selects the per-state min.
            return _dedup_select(o[1], o[0], o[2:], k)

        out = jax.lax.cond(exact, prefix_path, full_path, None)

    new_cost, new_state = out[0], out[1]
    dead = jnp.isinf(new_cost)
    new_state = jnp.where(dead, -1, new_state)
    new_prev = out[2]
    new_word = jnp.where(dead, 0, out[3])
    if word2 is None:
        result = (Beam(new_state, new_cost), new_prev, new_word)
    else:
        new_word2 = jnp.where(dead, 0, out[4])
        result = (Beam(new_state, new_cost), new_prev, new_word, new_word2)
    return result + (exact,) if return_exact else result


# ---------------------------------------------------------------------------
# Frame step
# ---------------------------------------------------------------------------

def _block_budget(opts: DecoderOptions, block: int) -> int:
    return max(1, opts.expand_budget // block)


# Dense expansion is used when K·max_blocks stays within this multiple of the
# block budget; beyond that the flat (searchsorted) path bounds the work.
DENSE_BUDGET_FACTOR = 2


def _expand(beam: Beam, blocks: ArcBlocks, opts: DecoderOptions):
    """Choose dense vs flat expansion; returns flat candidate arrays.

    Dense (per-token ``max_blocks`` rows, no prefix sums / searchsorted — the
    searchsorted alone costs ~8 ms at K=2048 on TPU) wins whenever per-state
    degree is modest; high-degree graphs use the flat budgeted path.  The
    beam is always cost-ascending (select_beam output), so flat-path
    truncation inherently drops the worst tokens without extra sorting.
    Batched (leading dims on beam leaves) or per-lane.
    """
    k = beam.state.shape[-1]
    eb = _block_budget(opts, blocks.block)
    slots = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32),
                             beam.state.shape)
    if max(1, blocks.max_blocks) * k <= DENSE_BUDGET_FACTOR * eb:
        return expand_dense(beam.state, beam.cost, slots, blocks)
    fn = lambda s, c, sl: expand_blocks(s, c, sl, blocks, eb)
    for _ in range(beam.state.ndim - 1):
        fn = jax.vmap(fn)
    return fn(beam.state, beam.cost, slots)


def _flat2(a: jnp.ndarray) -> jnp.ndarray:
    """Merge the trailing (rows, BLOCK) candidate dims into one axis."""
    return a.reshape(a.shape[:-2] + (-1,))


def _emitting(beam: Beam, scores_t: jnp.ndarray, g: GraphArrays,
              opts: DecoderOptions):
    """One ProcessEmitting (decoder.cc:224-301): expand non-eps arcs, score,
    prune, dedup, select.  Returns (beam, prev, word, word2, overflow);
    word2 is None unless the graph is eps-folded (only folded arcs can carry
    two words — unfolded graphs skip the extra sort payload entirely).
    Batched: beam leaves (B, K), scores_t (B, P)."""
    k = beam.state.shape[-1]
    nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, overflow = \
        _expand(beam, g.emit, opts)
    score_fn = lookup_scores
    for _ in range(beam.state.ndim - 1):
        score_fn = jax.vmap(score_fn)
    ac_cost = -score_fn(scores_t, pdf)  # MXU one-hot (gather if small)
    cand_cost = tok_cost[..., None] + weight + ac_cost
    cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
    word2 = None if olabel2 is None else _flat2(olabel2)
    out = select_beam(_flat2(nxt), _flat2(cand_cost), _flat2(cand_prev),
                      _flat2(olabel), k, jnp.float32(opts.beam),
                      word2=word2)
    if word2 is None:
        new_beam, prev, word = out
        return new_beam, prev, word, None, overflow
    new_beam, prev, word, w2 = out
    return new_beam, prev, word, w2, overflow


def _eps_sweep(beam: Beam, g: GraphArrays, opts: DecoderOptions,
               beam_width):
    """One epsilon relaxation sweep (work-list DFS → data-parallel sweep,
    decoder.cc:186-221).  Existing tokens are carried as candidates with
    identity backpointers so surviving tokens keep their history.
    Returns (beam, prev, word, overflow)."""
    k = beam.state.shape[-1]
    nxt, _pdf, olabel, _ol2, weight, tok_cost, tok_slot, overflow = \
        _expand(beam, g.eps, opts)
    cand_cost = tok_cost[..., None] + weight
    cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)

    keep_slot = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32),
                                 beam.state.shape)
    all_state = jnp.concatenate([beam.state, _flat2(nxt)], axis=-1)
    all_cost = jnp.concatenate([beam.cost, _flat2(cand_cost)], axis=-1)
    all_prev = jnp.concatenate([keep_slot, _flat2(cand_prev)], axis=-1)
    all_word = jnp.concatenate(
        [jnp.zeros(beam.state.shape, jnp.int32), _flat2(olabel)], axis=-1)
    new_beam, prev, word = select_beam(all_state, all_cost, all_prev,
                                       all_word, k, beam_width)
    return new_beam, prev, word, overflow


def _identity_record(shape) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return (jnp.broadcast_to(jnp.arange(shape[-1], dtype=jnp.int32), shape),
            jnp.zeros(shape, jnp.int32))


def frame_step(beam: Beam, scores_t: jnp.ndarray, frame_valid: jnp.ndarray,
               g: GraphArrays, opts: DecoderOptions,
               num_eps_iters: int) -> Tuple[Beam, StepRecord, jnp.ndarray]:
    """Emitting pass (+ G epsilon sweeps when the graph is not eps-folded)
    for one frame; masked no-op when the frame is padding.

    BATCHED: beam leaves (B, K), scores_t (B, P), frame_valid (B,); records
    come back (B, gens, K).  The batch rides leading axes rather than
    ``jax.vmap`` so select_beam's exactness guard stays a real branch
    (vmapped ``lax.cond`` lowers to select and runs both sides).

    Folded graphs need no sweeps — closure successors arrive as emitting
    candidates — and a folded arc's second word rides an identity-prev
    second record generation, so the record format and traceback are
    unchanged: generation 0 = (cand_prev, word1), generation 1 =
    (identity, word2).

    Returns (beam, records, overflow) — overflow (B,) True when this frame's
    arc expansion exceeded the block budget and dropped arcs (surface it;
    never silent — VERDICT r1 #5)."""
    b, k = beam.state.shape
    new_beam, prev0, word0, word2_0, ov_emit = _emitting(beam, scores_t,
                                                         g, opts)

    if g.folded:
        final_beam = new_beam
        overflow = ov_emit
        id_slot = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (b, k))
        rec_prev = jnp.stack([prev0, id_slot], axis=1)       # (B, 2, K)
        word2_0 = jnp.zeros_like(word0) if word2_0 is None else word2_0
        rec_word = jnp.stack([word0, word2_0], axis=1)
    else:
        def sweep(bm, _):
            nb, p, w, ov = _eps_sweep(bm, g, opts, jnp.float32(opts.beam))
            return nb, (p, w, ov)

        final_beam, (prevs, words, ovs) = jax.lax.scan(
            sweep, new_beam, None, length=num_eps_iters)   # (G, B, K)
        overflow = ov_emit | jnp.any(ovs, axis=0)

        rec_prev = jnp.concatenate(
            [prev0[:, None], jnp.swapaxes(prevs, 0, 1)], axis=1)
        rec_word = jnp.concatenate(
            [word0[:, None], jnp.swapaxes(words, 0, 1)], axis=1)

    # Padding frames: keep the beam and write identity records.
    id_prev, id_word = _identity_record(rec_prev.shape)
    v = frame_valid[:, None]
    vr = frame_valid[:, None, None]
    out_beam = Beam(
        jnp.where(v, final_beam.state, beam.state),
        jnp.where(v, final_beam.cost, beam.cost))
    rec = StepRecord(
        jnp.where(vr, rec_prev, id_prev),
        jnp.where(vr, rec_word, id_word))
    return out_beam, rec, overflow & frame_valid


# ---------------------------------------------------------------------------
# Init / chunk drivers (single utterance; batch via vmap in decoder.py)
# ---------------------------------------------------------------------------

def init_beam(batch: int, g: GraphArrays, opts: DecoderOptions,
              num_eps_iters: int) -> Tuple[Beam, StepRecord]:
    """InitDecoding (decoder.cc:79-97): start token + eps closure w/o cutoff.

    Batched: returns beam leaves (B, K), records (B, G0, K)."""
    k = opts.max_active
    state = jnp.full((batch, k), -1, jnp.int32).at[:, 0].set(g.start_state)
    cost = jnp.full((batch, k), jnp.inf, jnp.float32).at[:, 0].set(0.0)
    beam = Beam(state, cost)

    def sweep(b, _):
        nb, p, w, _ov = _eps_sweep(b, g, opts, jnp.float32(jnp.inf))
        return nb, (p, w)

    beam, (prevs, words) = jax.lax.scan(sweep, beam, None,
                                        length=num_eps_iters)
    return beam, StepRecord(jnp.swapaxes(prevs, 0, 1),
                            jnp.swapaxes(words, 0, 1))


@partial(jax.jit, static_argnames=("g", "opts", "num_eps_iters"))
def decode_chunk(beam: Beam, scores: jnp.ndarray, frame_valid: jnp.ndarray,
                 g: GraphArrays, opts: DecoderOptions,
                 num_eps_iters: int):
    """Scan the batched ``frame_step`` over a chunk.

    beam:        pytree with leading batch axis B on each leaf
    scores:      (B, C, P) acoustic-scaled log-likelihoods
    frame_valid: (B, C) bool
    returns (new beam, records with shape (B, C, 1+G, K),
             overflow (B, C) bool — frames whose arc expansion dropped arcs).
    """
    def body(b, xs):
        s_t, v_t = xs
        b2, rec, ov = frame_step(b, s_t, v_t, g, opts, num_eps_iters)
        return b2, (rec, ov)

    xs = (jnp.swapaxes(scores, 0, 1), jnp.swapaxes(frame_valid, 0, 1))
    new_beam, (recs, ovs) = jax.lax.scan(body, beam, xs)
    recs = StepRecord(jnp.swapaxes(recs.prev, 0, 1),
                      jnp.swapaxes(recs.word, 0, 1))
    return new_beam, recs, jnp.swapaxes(ovs, 0, 1)


@partial(jax.jit, static_argnames=("g", "opts", "num_eps_iters", "k"))
def decode_chunk_k(beam: Beam, scores: jnp.ndarray, frame_valid: jnp.ndarray,
                   g: GraphArrays, opts: DecoderOptions, num_eps_iters: int,
                   k: int):
    """``decode_chunk`` at an explicit beam capacity ``k``, plus occupancy.

    The burst phase's flood is K-shaped in time (measured per-lane demand:
    ≤2k tokens on frames 0–3, the full cap on 4–8, ≤8k on 9–15 —
    scripts/probe_occupancy.py), so its sub-chunks run at per-segment
    capacities learned from occupancy.  Returns (beam', records, overflow,
    full) where ``full`` (B,) is True when some frame ended with EVERY slot
    live — at k < max_active that means top-k MAY have truncated tokens the
    full-capacity beam would keep, so the caller must retry the segment at
    a higher rung (conservative: an exactly-full beam with no true
    truncation also trips it; the learned rung is chosen strictly above
    observed occupancy so steady state never retries).  At k == max_active
    the flag is meaningless (the cap IS the semantics) and callers ignore
    it.  Capacity is carried by the BEAM SHAPE (select_beam sizes its top-K
    from it), so ``opts`` passes through unchanged; ``k`` is static only to
    key the compile and the full-flag comparison."""
    assert beam.state.shape[-1] == k
    # The full-flag is a sound truncation detector only when the frame does
    # a SINGLE select: with eps sweeps, an emitting-select truncation at k
    # can be masked when a later sweep's dedup leaves < k live tokens, so a
    # caller would wrongly trust a truncated segment.  Unfolded graphs must
    # use decode_chunk (no ramp) instead.
    assert g.folded or num_eps_iters == 0, \
        "decode_chunk_k's full-flag requires a folded graph (single select)"

    def body(b, xs):
        s_t, v_t = xs
        b2, rec, ov = frame_step(b, s_t, v_t, g, opts, num_eps_iters)
        live = jnp.sum(b2.state >= 0, axis=-1)          # (B,)
        return b2, (rec, ov, live)

    xs = (jnp.swapaxes(scores, 0, 1), jnp.swapaxes(frame_valid, 0, 1))
    new_beam, (recs, ovs, lives) = jax.lax.scan(body, beam, xs)
    recs = StepRecord(jnp.swapaxes(recs.prev, 0, 1),
                      jnp.swapaxes(recs.word, 0, 1))
    full = jnp.any(jnp.swapaxes(lives, 0, 1) >= k, axis=1)      # (B,)
    occ = jnp.max(lives)                                        # scalar
    return new_beam, recs, jnp.swapaxes(ovs, 0, 1), full, occ


def pad_beam(beam: Beam, k_new: int) -> Beam:
    """Widen a beam with dead tail slots (live slots are a cost-sorted
    prefix, so indices — hence backpointers — are unchanged)."""
    extra = k_new - beam.state.shape[-1]
    assert extra >= 0
    pad = [(0, 0)] * (beam.state.ndim - 1) + [(0, extra)]
    return Beam(jnp.pad(beam.state, pad, constant_values=-1),
                jnp.pad(beam.cost, pad, constant_values=np.inf))


@partial(jax.jit, static_argnames=("k_new",))
def shrink_beam(beam: Beam, k_new: int) -> Tuple[Beam, jnp.ndarray]:
    """Slice a beam to ``k_new`` slots; ``ok`` False when live tokens
    extend past the cut (select_beam output is cost-ascending, so live
    tokens form a prefix and the check is exact)."""
    ok = jnp.all(beam.state[..., k_new:] < 0)
    return Beam(beam.state[..., :k_new], beam.cost[..., :k_new]), ok


@partial(jax.jit, static_argnames=("batch", "g", "opts", "num_eps_iters"))
def init_beam_batch(batch: int, g: GraphArrays, opts: DecoderOptions,
                    num_eps_iters: int) -> Tuple[Beam, StepRecord]:
    return init_beam(batch, g, opts, num_eps_iters)


def init_beam_host(batch: int, g: GraphArrays, opts: DecoderOptions,
                   num_eps_iters: int) -> Tuple[Beam, StepRecord]:
    """``init_beam_batch`` computed on the host CPU backend.

    Returns (beam placed on the DEFAULT device, init records left on the
    host — every consumer reads them with ``np.asarray`` during traceback).
    The init closure is score-independent one-shot work, but its program
    (K-wide candidate sorts scanned over eps sweeps) costs MINUTES to
    compile through a tunneled-TPU toolchain (measured ~9 min at K=16384,
    B=32 — the r2 bench timeout, VERDICT r2 weak #1); XLA:CPU compiles it
    locally in seconds, and the path (gathers, stable sorts, f32 adds) is
    bit-identical across backends.
    """
    default = jax.devices()[0]
    if default.platform == "cpu":
        return init_beam_batch(batch, g, opts, num_eps_iters)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return init_beam_batch(batch, g, opts, num_eps_iters)
    with jax.default_device(cpu):
        beam, rec = init_beam_batch(batch, g.cpu_mirror(), opts,
                                    num_eps_iters)
    return jax.device_put(beam, default), rec


@jax.jit
def traceback_chunk(slot: jnp.ndarray, rec: StepRecord):
    """Walk one chunk's records backwards on device.

    slot: (B,) current slot (entering from the NEXT chunk / final beam);
    rec:  records with shapes (B, C, G, K).
    Returns (new slot (B,), words (B, C, G)) where words[b, t, g] is the
    olabel collected at that generation (0 = none), to be read forwards
    (t asc, g asc) by the host assembler.

    This keeps the giant (B, C, G, K) arrays on device — only the (B, C, G)
    word plane crosses to the host, which matters when the host↔device link
    is the bottleneck.

    Structured as ONE scan over the flattened (C·G) generation axis with a
    batched ``take_along_axis`` per step.  The earlier form — a vmapped scan
    of scans with per-utterance scalar gathers — silently miscompiled on
    XLA:TPU at (B, C, G, K) = (32, 64, 2, 8192) (wrong slots/words on random
    data; docs/PERFORMANCE.md); the flat form is also one fewer loop level.
    """
    b, c, g, k = rec.prev.shape
    # (C·G, B, K), reversed in walk order (g desc within t desc).
    prev = jnp.swapaxes(rec.prev.reshape(b, c * g, k), 0, 1)[::-1]
    word = jnp.swapaxes(rec.word.reshape(b, c * g, k), 0, 1)[::-1]

    def step(s, xs):
        p, w = xs                         # (B, K)
        sc = jnp.maximum(s, 0)[:, None]
        return (jnp.take_along_axis(p, sc, axis=1)[:, 0],
                jnp.take_along_axis(w, sc, axis=1)[:, 0])

    s, words_rev = jax.lax.scan(step, slot, (prev, word))
    return s, jnp.swapaxes(words_rev[::-1], 0, 1).reshape(b, c, g)


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
