"""Third ablation: segmented-sort select + narrower expansion.

Sort cost on TPU scales with width * log^2(width); the select currently
sorts the full candidate array (N=16384) in one go.  Segmenting into SEG
width-W local sorts (ONE batched sort op), keeping each segment's P-cheapest
(payloads riding, no index gathers), and sorting the SEG*P merge is exact
whenever no segment discarded anything cheaper than the merge's m-th cost —
device-checkable, lax.cond fallback to the full sort.

Also measures raw lax.sort scaling and the flat block=8 expansion.
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


def seg_select(state, cost, prev, word, k, beam_width, word2,
               seg_w=1024, keep=256):
    """Segmented select: exact when the device guard passes, full-sort
    fallback otherwise.  Semantics identical to select_beam."""
    n = state.shape[-1]
    lead = state.shape[:-1]
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
    # prefix-dedup exactness on the merged order (same as select_beam)
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


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk = 64

    pack = {"peakiness": 16.0, "weight_spread": 1.0, "word_on_emit": 0.3}
    tag = "p{peakiness:g}-ws{weight_spread:g}-we{word_on_emit:g}".format(
        **pack)
    conf = os.path.join(CACHE, f"benchmodel-{tag}", "model.conf")
    if not os.path.exists(conf):
        write_bench_model(os.path.dirname(conf), seed=0, **pack)

    rec = Recognizer.load(conf)
    opts = DecoderOptions(max_active=k, expand_factor=8, chunk_frames=chunk)
    g = B.GraphArrays.build(rec.fst, rec.am.tid2pdf, fold_eps=opts.fold_eps)
    p = rec.am.num_pdfs
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, chunk, p).astype(np.float32) * 4.0)
    scores = jax.nn.log_softmax(logits, axis=-1) * 0.1
    n_eps = 0 if g.folded else max(1, g.eps_depth)
    beam0, _ = B.init_beam_batch(b, g, opts, max(1, g.closure_sweeps + 1)
                                 if g.folded else n_eps)
    beam1, _, _ = B.decode_chunk(beam0, scores[:, :8],
                                 jnp.ones((b, 8), bool), g, opts, n_eps)
    jax.block_until_ready(beam1)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:36s} {dt*1e3:9.2f} ms  ({dt/chunk*1e3:7.3f} ms/frame)")

    # raw sort scaling (5 operands, 1 key), per call
    for w in (1024, 2048, 4096, 8192, 16384):
        cs = jnp.asarray((rng.rand(b, 16384 // w, w) * 30)
                         .astype(np.float32))
        ops = (cs,) + tuple(jnp.zeros_like(cs, jnp.int32) for _ in range(4))
        f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True))
        out = f(*ops)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(*ops)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20
        print(f"raw sort  (B,{16384//w:3d},{w:6d}) 5-ops   {dt*1e3:7.3f} ms")

    def make_scan(mode, seg_w=1024, keep=256):
        def step(bm, s_t):
            nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, _ = \
                B._expand(bm, g.emit, opts)
            ac = -jax.vmap(B.lookup_scores)(s_t, pdf)
            cand_cost = tok_cost[..., None] + weight + ac
            cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
            w2 = None if olabel2 is None else B._flat2(olabel2)
            args = (B._flat2(nxt), B._flat2(cand_cost), B._flat2(cand_prev),
                    B._flat2(olabel), k, jnp.float32(opts.beam))
            if mode == "base":
                out = B.select_beam(*args, word2=w2)
            else:
                out = seg_select(*args, word2=w2, seg_w=seg_w, keep=keep)
            return out[0], None

        def run(bm, s):
            return jax.lax.scan(step, bm, jnp.swapaxes(s, 0, 1))[0]
        return jax.jit(run)

    timeit("scan[base]", make_scan("base"), beam1, scores)
    for seg_w, keep in ((1024, 256), (2048, 512), (1024, 384)):
        timeit(f"scan[seg w={seg_w} keep={keep}]",
               make_scan("seg", seg_w, keep), beam1, scores)

    # equivalence check on one frame
    nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, _ = \
        B._expand(beam1, g.emit, opts)
    ac = -jax.vmap(B.lookup_scores)(scores[:, 0], pdf)
    cand_cost = tok_cost[..., None] + weight + ac
    cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
    w2 = None if olabel2 is None else B._flat2(olabel2)
    a1 = B.select_beam(B._flat2(nxt), B._flat2(cand_cost),
                       B._flat2(cand_prev), B._flat2(olabel), k,
                       jnp.float32(opts.beam), word2=w2)
    a2 = seg_select(B._flat2(nxt), B._flat2(cand_cost), B._flat2(cand_prev),
                    B._flat2(olabel), k, jnp.float32(opts.beam), word2=w2)
    same = all(bool(jnp.array_equal(x, y)) for x, y in
               zip(jax.tree.leaves(a1), jax.tree.leaves(a2)))
    print("seg_select == select_beam on a real frame:", same)


if __name__ == "__main__":
    main()
