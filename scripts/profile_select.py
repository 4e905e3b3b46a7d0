"""Attribute the in-context cost of select_beam inside the frame-step scan.

Variants:
  cond     — current code (exactness guard, lax.cond between prefix/full)
  prefix   — guard removed, always take the 2K-prefix dedup path (UNSAFE,
             measurement only)
  full     — always full-N dedup (two sorts of N)
  topk     — cost top-(2K) via lax.top_k instead of a full sort, then dedup
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pocketkaldi_tpu.decoder import beam as B
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.recognizer import Recognizer
from pocketkaldi_tpu.tools.make_fixtures import write_bench_model

INT_MAX = B.INT_MAX


def select_variant(state, cost, prev, word, k, beam_width, word2, mode):
    n = state.shape[-1]
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
        neg = -cost
        _, idx = jax.lax.top_k(neg, m)      # top-2K by cost ascending
        o = tuple(jnp.take_along_axis(a, idx, axis=-1)
                  for a in (cost, state_key) + payloads)
        out = prefix_of(o)
    else:
        raise ValueError(mode)

    new_cost, new_state = out[0], out[1]
    dead = jnp.isinf(new_cost)
    new_state = jnp.where(dead, -1, new_state)
    res = (B.Beam(new_state, new_cost), out[2],
           jnp.where(dead, 0, out[3]))
    if word2 is not None:
        return res + (jnp.where(dead, 0, out[4]),)
    return res


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk = 64

    pack = {"peakiness": 16.0, "weight_spread": 1.0, "word_on_emit": 0.3}
    tag = "p{peakiness:g}-ws{weight_spread:g}-we{word_on_emit:g}".format(
        **pack)
    model_dir = os.path.join(CACHE, f"benchmodel-{tag}")
    conf = os.path.join(model_dir, "model.conf")
    if not os.path.exists(conf):
        write_bench_model(model_dir, seed=0, **pack)

    rec = Recognizer.load(conf)
    opts = DecoderOptions(max_active=k, expand_factor=8, chunk_frames=chunk)
    g = B.GraphArrays.build(rec.fst, rec.am.tid2pdf, fold_eps=opts.fold_eps)
    p = rec.am.num_pdfs
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, chunk, p).astype(np.float32) * 4.0)
    scores = jax.nn.log_softmax(logits, axis=-1) * 0.1
    valid = jnp.ones((b, chunk), bool)
    n_eps = 0 if g.folded else max(1, g.eps_depth)
    beam0, _ = B.init_beam_batch(b, g, opts, max(1, g.closure_sweeps + 1)
                                 if g.folded else n_eps)
    beam1, _, _ = B.decode_chunk(beam0, scores[:, :8], valid[:, :8], g, opts,
                                 n_eps)
    jax.block_until_ready(beam1)

    # How often does the exactness guard hold on real frames?
    def guard_stats(bm, s):
        def step(bm, s_t):
            nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, _ = \
                B._expand(bm, g.emit, opts)
            ac = -jax.vmap(B.lookup_scores)(s_t, pdf)
            cand_cost = tok_cost[..., None] + weight + ac
            state = B._flat2(nxt)
            cost = B._flat2(cand_cost)
            best = jnp.min(cost, axis=-1, keepdims=True)
            cost = jnp.where(cost <= best + opts.beam, cost, jnp.inf)
            skey = jnp.where(jnp.isinf(cost), INT_MAX, state)
            m = 2 * k
            o = jax.lax.sort((cost, skey), num_keys=1, is_stable=True)
            finite_total = jnp.sum(jnp.isfinite(o[0][..., :m + 1]), axis=-1)
            pre_s, pre_c = o[1][..., :m], o[0][..., :m]
            q = jax.lax.sort((pre_s, pre_c), num_keys=2, is_stable=True)
            uniq = B._first_of_run(q[0]) & jnp.isfinite(q[1])
            u = jnp.sum(uniq, axis=-1)
            lane_ok = (u >= k) | (finite_total <= m)
            # advance the beam for the next frame with the real select
            out = B.select_beam(state, cost, B._flat2(jnp.broadcast_to(
                tok_slot[..., None], nxt.shape)), B._flat2(olabel), k,
                jnp.float32(opts.beam),
                word2=None if olabel2 is None else B._flat2(olabel2))
            return out[0], (jnp.all(lane_ok), jnp.sum(lane_ok), u.min())
        _, (ok, nok, umin) = jax.lax.scan(step, bm, jnp.swapaxes(s, 0, 1))
        return ok, nok, umin

    ok, nok, umin = jax.jit(guard_stats)(beam1, scores)
    print("guard all-lanes-exact frames:", int(jnp.sum(ok)), "/", chunk,
          " min lanes ok:", int(jnp.min(nok)), "/", b,
          " min distinct-in-prefix:", int(jnp.min(umin)))

    def make_scan(mode):
        def step(bm, s_t):
            nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, _ = \
                B._expand(bm, g.emit, opts)
            ac = -jax.vmap(B.lookup_scores)(s_t, pdf)
            cand_cost = tok_cost[..., None] + weight + ac
            cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
            w2 = None if olabel2 is None else B._flat2(olabel2)
            if mode == "cond":
                out = B.select_beam(B._flat2(nxt), B._flat2(cand_cost),
                                    B._flat2(cand_prev), B._flat2(olabel), k,
                                    jnp.float32(opts.beam), word2=w2)
            else:
                out = select_variant(B._flat2(nxt), B._flat2(cand_cost),
                                     B._flat2(cand_prev), B._flat2(olabel),
                                     k, jnp.float32(opts.beam), w2, mode)
            return out[0], None

        def run(bm, s):
            return jax.lax.scan(step, bm, jnp.swapaxes(s, 0, 1))[0]
        return jax.jit(run)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt*1e3:9.2f} ms  ({dt/chunk*1e3:7.3f} ms/frame)")

    for mode in ("cond", "prefix", "full", "topk"):
        timeit(f"scan[select:{mode}]", make_scan(mode), beam1, scores)


if __name__ == "__main__":
    main()
