"""Select-stage ablation harness (consolidates the round-2 variants —
VERDICT r2 #10; findings recorded in docs/PERFORMANCE.md).

Suites (``--suite``, default ``variants``):
  variants  — select_beam alternatives inside the real frame scan:
              cond (current exactness-guarded prefix dedup), prefix (guard
              removed — UNSAFE, measurement only), full (two sorts of N),
              topk (lax.top_k prefill)
  guard     — how often the prefix-dedup exactness guard holds per frame
  context   — why the in-context sort costs more than an isolated one:
              base / optimization_barrier / packed payloads / cost-sort-only
              + isolated select on fresh vs reshaped operands
  segmented — segmented-sort select (SEG local sorts + merge + device
              exactness guard) vs base, + raw lax.sort width scaling

Usage: python scripts/profile_select.py [--suite S] [batch] [max_active]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pocketkaldi_tpu.decoder import beam as B
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.recognizer import Recognizer
from pocketkaldi_tpu.tools.make_fixtures import write_bench_model

INT_MAX = B.INT_MAX
CHUNK = 64


# ---------------------------------------------------------------------------
# Select variants
# ---------------------------------------------------------------------------

def select_variant(state, cost, prev, word, k, beam_width, word2, mode):
    """prefix / full / topk select (semantics of select_beam, minus the
    exactness guard — measurement only)."""
    best = jnp.min(cost, axis=-1, keepdims=True)
    cost = jnp.where(cost <= best + beam_width, cost, jnp.inf)
    state_key = jnp.where(jnp.isinf(cost), INT_MAX, state)
    payloads = (prev, word) if word2 is None else (prev, word, word2)
    m = 2 * k

    def prefix_of(o):
        pre = tuple(a[..., :m] for a in o)
        q = jax.lax.sort((pre[1], pre[0]) + pre[2:], num_keys=2,
                         is_stable=True)
        uniq = B._first_of_run(q[0]) & jnp.isfinite(q[1])
        qc = jnp.where(uniq, q[1], jnp.inf)
        r = jax.lax.sort((qc, q[0]) + q[2:], num_keys=1, is_stable=True)
        return tuple(a[..., :k] for a in r)

    if mode == "full":
        out = B._dedup_select(state_key, cost, payloads, k)
    elif mode == "prefix":
        o = jax.lax.sort((cost, state_key) + payloads, num_keys=1,
                         is_stable=True)
        out = prefix_of(o)
    elif mode == "topk":
        _, idx = jax.lax.top_k(-cost, m)
        o = tuple(jnp.take_along_axis(a, idx, axis=-1)
                  for a in (cost, state_key) + payloads)
        out = prefix_of(o)
    else:
        raise ValueError(mode)

    new_cost, new_state = out[0], out[1]
    dead = jnp.isinf(new_cost)
    res = (B.Beam(jnp.where(dead, -1, new_state), new_cost), out[2],
           jnp.where(dead, 0, out[3]))
    if word2 is not None:
        return res + (jnp.where(dead, 0, out[4]),)
    return res


def seg_select(state, cost, prev, word, k, beam_width, word2,
               seg_w=1024, keep=256):
    """Segmented select: SEG width-W local sorts (one batched op), keep each
    segment's ``keep`` cheapest, sort the SEG·keep merge.  Exact when no
    segment discarded anything cheaper than the merge's 2K-th cost —
    device-checked, lax.cond fallback to the full sort."""
    lead = state.shape[:-1]
    n = state.shape[-1]
    seg = n // seg_w
    m = 2 * k
    best = jnp.min(cost, axis=-1, keepdims=True)
    cost = jnp.where(cost <= best + beam_width, cost, jnp.inf)
    state_key = jnp.where(jnp.isinf(cost), INT_MAX, state)
    payloads = (prev, word) if word2 is None else (prev, word, word2)

    ops = (cost, state_key) + payloads
    segged = tuple(a.reshape(lead + (seg, seg_w)) for a in ops)
    s = jax.lax.sort(segged, num_keys=1, is_stable=True)
    seg_finite = jnp.sum(jnp.isfinite(segged[0]), axis=-1)   # (…, seg)
    kept = tuple(a[..., :keep] for a in s)
    kept_max = kept[0][..., -1]                              # (…, seg)
    merged = tuple(a.reshape(lead + (seg * keep,)) for a in kept)
    o = jax.lax.sort(merged, num_keys=1, is_stable=True)

    c2k = o[0][..., m - 1]
    seg_ok = (kept_max > c2k[..., None]) | (seg_finite <= keep)
    pre = tuple(a[..., :m] for a in o)
    q = jax.lax.sort((pre[1], pre[0]) + pre[2:], num_keys=2, is_stable=True)
    uniq = B._first_of_run(q[0]) & jnp.isfinite(q[1])
    u = jnp.sum(uniq, axis=-1)
    all_fit = jnp.all(seg_finite <= keep, axis=-1) & \
        (jnp.sum(seg_finite, axis=-1) <= m)
    exact = jnp.all(jnp.all(seg_ok, axis=-1) & ((u >= k) | all_fit))

    def fast(_):
        qc = jnp.where(uniq, q[1], jnp.inf)
        r = jax.lax.sort((qc, q[0]) + q[2:], num_keys=1, is_stable=True)
        return tuple(a[..., :k] for a in r)

    def slow(_):
        return B._dedup_select(state_key, cost, payloads, k)

    out = jax.lax.cond(exact, fast, slow, None)
    new_cost, new_state = out[0], out[1]
    dead = jnp.isinf(new_cost)
    res = (B.Beam(jnp.where(dead, -1, new_state), new_cost), out[2],
           jnp.where(dead, 0, out[3]))
    if word2 is not None:
        return res + (jnp.where(dead, 0, out[4]),)
    return res


# ---------------------------------------------------------------------------
# Shared setup / timing
# ---------------------------------------------------------------------------

def setup(b, k):
    pack = {"peakiness": 16.0, "weight_spread": 1.0, "word_on_emit": 0.3}
    tag = "p{peakiness:g}-ws{weight_spread:g}-we{word_on_emit:g}".format(
        **pack)
    conf = os.path.join(CACHE, f"benchmodel-{tag}", "model.conf")
    if not os.path.exists(conf):
        write_bench_model(os.path.dirname(conf), seed=0, **pack)
    rec = Recognizer.load(conf)
    opts = DecoderOptions(max_active=k, expand_factor=8, chunk_frames=CHUNK)
    g = B.GraphArrays.build(rec.fst, rec.am.tid2pdf, fold_eps=opts.fold_eps)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(
        rng.randn(b, CHUNK, rec.am.num_pdfs).astype(np.float32) * 4.0)
    scores = jax.nn.log_softmax(logits, axis=-1) * 0.1
    n_eps = 0 if g.folded else max(1, g.eps_depth)
    beam0, _ = B.init_beam_host(b, g, opts, max(1, g.closure_sweeps + 1)
                                if g.folded else n_eps)
    beam1, _, _ = B.decode_chunk(beam0, scores[:, :8],
                                 jnp.ones((b, 8), bool), g, opts, n_eps)
    jax.block_until_ready(beam1)
    return rec, g, opts, beam1, scores, rng


def candidates(bm, s_t, g, opts):
    nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, _ = \
        B._expand(bm, g.emit, opts)
    ac = -jax.vmap(B.lookup_scores)(s_t, pdf)
    cand_cost = tok_cost[..., None] + weight + ac
    cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
    return (B._flat2(nxt), B._flat2(cand_cost), B._flat2(cand_prev),
            B._flat2(olabel),
            None if olabel2 is None else B._flat2(olabel2))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e3:9.2f} ms  ({dt/CHUNK*1e3:7.3f} ms/frame)")


def scan_of(step_fn):
    def run(bm, s):
        return jax.lax.scan(step_fn, bm, jnp.swapaxes(s, 0, 1))[0]
    return jax.jit(run)


# ---------------------------------------------------------------------------
# Suites
# ---------------------------------------------------------------------------

def suite_variants(b, k):
    rec, g, opts, beam1, scores, _ = setup(b, k)

    def make(mode):
        def step(bm, s_t):
            state, cost, prev, word, word2 = candidates(bm, s_t, g, opts)
            if mode == "cond":
                out = B.select_beam(state, cost, prev, word, k,
                                    jnp.float32(opts.beam), word2=word2)
            else:
                out = select_variant(state, cost, prev, word, k,
                                     jnp.float32(opts.beam), word2, mode)
            return out[0], None
        return scan_of(step)

    for mode in ("cond", "prefix", "full", "topk"):
        timeit(f"scan[select:{mode}]", make(mode), beam1, scores)


def suite_guard(b, k):
    rec, g, opts, beam1, scores, _ = setup(b, k)
    m = 2 * k

    def stats(bm, s):
        def step(bm, s_t):
            state, cost, prev, word, word2 = candidates(bm, s_t, g, opts)
            best = jnp.min(cost, axis=-1, keepdims=True)
            cost_b = jnp.where(cost <= best + opts.beam, cost, jnp.inf)
            skey = jnp.where(jnp.isinf(cost_b), INT_MAX, state)
            o = jax.lax.sort((cost_b, skey), num_keys=1, is_stable=True)
            finite_total = jnp.sum(jnp.isfinite(o[0][..., :m + 1]), axis=-1)
            q = jax.lax.sort((o[1][..., :m], o[0][..., :m]), num_keys=2,
                             is_stable=True)
            uniq = B._first_of_run(q[0]) & jnp.isfinite(q[1])
            u = jnp.sum(uniq, axis=-1)
            lane_ok = (u >= k) | (finite_total <= m)
            out = B.select_beam(state, cost, prev, word, k,
                                jnp.float32(opts.beam), word2=word2)
            return out[0], (jnp.all(lane_ok), jnp.sum(lane_ok), u.min())
        _, (ok, nok, umin) = jax.lax.scan(step, bm, jnp.swapaxes(s, 0, 1))
        return ok, nok, umin

    ok, nok, umin = jax.jit(stats)(beam1, scores)
    print("guard all-lanes-exact frames:", int(jnp.sum(ok)), "/", CHUNK,
          " min lanes ok:", int(jnp.min(nok)), "/", b,
          " min distinct-in-prefix:", int(jnp.min(umin)))


def suite_context(b, k):
    rec, g, opts, beam1, scores, rng = setup(b, k)

    def make(mode):
        def step(bm, s_t):
            state, cost, prev, word, word2 = candidates(bm, s_t, g, opts)
            if mode == "barrier":
                state, cost, prev, word, word2 = \
                    jax.lax.optimization_barrier(
                        (state, cost, prev, word, word2))
            if mode == "pack":
                packed = (prev << 18) | word
                out = B.select_beam(state, cost, packed, word2, k,
                                    jnp.float32(opts.beam))
                return out[0], None
            if mode == "sortonly":
                o = jax.lax.sort((cost, state, prev, word, word2),
                                 num_keys=1, is_stable=True)
                return B.Beam(o[1][..., :k], o[0][..., :k]), None
            out = B.select_beam(state, cost, prev, word, k,
                                jnp.float32(opts.beam), word2=word2)
            return out[0], None
        return scan_of(step)

    for mode in ("base", "barrier", "pack", "sortonly"):
        timeit(f"scan[{mode}]", make(mode), beam1, scores)

    mb = max(1, g.emit.max_blocks)
    n = k * mb * g.emit.block
    cs = jnp.asarray(rng.randint(0, rec.fst.num_states, (b, n),
                                 dtype=np.int32))
    cc = jnp.asarray((rng.rand(b, n) * 30).astype(np.float32))
    pl = jnp.zeros((b, n), jnp.int32)
    iso = jax.jit(lambda st, c, q: B.select_beam(st, c, q, q, k,
                                                 jnp.float32(16.0), word2=q))
    timeit("iso-param", iso, cs, cc, pl, reps=20)
    shape3 = (b, k * mb, g.emit.block)
    iso3 = jax.jit(lambda st, c, q: B.select_beam(
        B._flat2(st), B._flat2(c), B._flat2(q), B._flat2(q), k,
        jnp.float32(16.0), word2=B._flat2(q)))
    timeit("iso-reshape3d", iso3, cs.reshape(shape3), cc.reshape(shape3),
           pl.reshape(shape3), reps=20)


def suite_segmented(b, k):
    rec, g, opts, beam1, scores, rng = setup(b, k)

    for w in (1024, 2048, 4096, 8192, 16384):
        cs = jnp.asarray((rng.rand(b, 16384 // w, w) * 30)
                         .astype(np.float32))
        ops = (cs,) + tuple(jnp.zeros_like(cs, jnp.int32) for _ in range(4))
        f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True))
        timeit(f"raw sort (B,{16384 // w:3d},{w:6d}) 5-ops", f, *ops,
               reps=20)

    def make(mode, seg_w=1024, keep=256):
        def step(bm, s_t):
            state, cost, prev, word, word2 = candidates(bm, s_t, g, opts)
            args = (state, cost, prev, word, k, jnp.float32(opts.beam))
            if mode == "base":
                out = B.select_beam(*args, word2=word2)
            else:
                out = seg_select(*args, word2=word2, seg_w=seg_w, keep=keep)
            return out[0], None
        return scan_of(step)

    timeit("scan[base]", make("base"), beam1, scores)
    for seg_w, keep in ((1024, 256), (2048, 512), (1024, 384)):
        timeit(f"scan[seg w={seg_w} keep={keep}]",
               make("seg", seg_w, keep), beam1, scores)

    # equivalence on one real frame
    state, cost, prev, word, word2 = candidates(beam1, scores[:, 0], g, opts)
    a1 = B.select_beam(state, cost, prev, word, k, jnp.float32(opts.beam),
                       word2=word2)
    a2 = seg_select(state, cost, prev, word, k, jnp.float32(opts.beam),
                    word2=word2)
    same = all(bool(jnp.array_equal(x, y)) for x, y in
               zip(jax.tree.leaves(a1), jax.tree.leaves(a2)))
    print("seg_select == select_beam on a real frame:", same)


SUITES = {"variants": suite_variants, "guard": suite_guard,
          "context": suite_context, "segmented": suite_segmented}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=sorted(SUITES), default="variants")
    ap.add_argument("batch", nargs="?", type=int, default=32)
    ap.add_argument("max_active", nargs="?", type=int, default=1024)
    args = ap.parse_args()
    SUITES[args.suite](args.batch, args.max_active)


if __name__ == "__main__":
    main()
