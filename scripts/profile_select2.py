"""Second select ablation: why is the in-context sort ~9x the isolated sort?

Variants inside the real scan:
  base     — current select_beam
  barrier  — optimization_barrier between candidate build and select
             (stops producer fusion into sort operands)
  pack     — prev/word packed into ONE int32 payload (prev<K fits 13 bits,
             word<2^18) → 4 sort operands instead of 5
  sortonly — the big cost sort alone (no dedup/prefix work) to price sortA
Isolated:
  iso-param    — select_beam on fresh device arrays (B, N)
  iso-reshape  — same data but passed as (B, K*mb, BLOCK) and _flat2'd
                 inside the jit (mimics in-context layout)
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

    def candidates(bm, s_t):
        nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, _ = \
            B._expand(bm, g.emit, opts)
        ac = -jax.vmap(B.lookup_scores)(s_t, pdf)
        cand_cost = tok_cost[..., None] + weight + ac
        cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
        return (B._flat2(nxt), B._flat2(cand_cost), B._flat2(cand_prev),
                B._flat2(olabel),
                None if olabel2 is None else B._flat2(olabel2))

    def make_scan(mode):
        def step(bm, s_t):
            state, cost, prev, word, word2 = candidates(bm, s_t)
            if mode == "barrier":
                state, cost, prev, word, word2 = \
                    jax.lax.optimization_barrier(
                        (state, cost, prev, word, word2))
            if mode == "pack":
                packed = (prev << 18) | word
                if word2 is not None:
                    out = B.select_beam(state, cost, packed, word2, k,
                                        jnp.float32(opts.beam))
                    nb, pk2, w2 = out
                    prev_k, word_k = pk2 >> 18, pk2 & ((1 << 18) - 1)
                    return nb, None
                raise RuntimeError
            if mode == "sortonly":
                o = jax.lax.sort((cost, state, prev, word, word2),
                                 num_keys=1, is_stable=True)
                nb = B.Beam(o[1][..., :k], o[0][..., :k])
                return nb, None
            out = B.select_beam(state, cost, prev, word, k,
                                jnp.float32(opts.beam), word2=word2)
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

    for mode in ("base", "barrier", "pack", "sortonly"):
        timeit(f"scan[{mode}]", make_scan(mode), beam1, scores)

    # isolated, with layouts
    mb = max(1, g.emit.max_blocks)
    n = k * mb * g.emit.block
    cs = jnp.asarray(rng.randint(0, rec.fst.num_states, (b, n),
                                 dtype=np.int32))
    cc = jnp.asarray((rng.rand(b, n) * 30).astype(np.float32))
    pl_ = jnp.zeros((b, n), jnp.int32)
    iso = jax.jit(lambda st, c, q: B.select_beam(st, c, q, q, k,
                                                 jnp.float32(16.0), word2=q))
    timeit("iso-param", iso, cs, cc, pl_, reps=20)

    cs3 = cs.reshape(b, k * mb, g.emit.block)
    cc3 = cc.reshape(b, k * mb, g.emit.block)
    pl3 = pl_.reshape(b, k * mb, g.emit.block)
    iso3 = jax.jit(lambda st, c, q: B.select_beam(
        B._flat2(st), B._flat2(c), B._flat2(q), B._flat2(q), k,
        jnp.float32(16.0), word2=B._flat2(q)))
    timeit("iso-reshape3d", iso3, cs3, cc3, pl3, reps=20)


if __name__ == "__main__":
    main()
