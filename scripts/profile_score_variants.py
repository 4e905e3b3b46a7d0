"""In-context score-stage variants inside the frame-step scan.

The isolated micro-bench says a plain batched gather is as fast as the
one-hot matmul at bench shapes (0.034 ms / 524k candidates) — this measures
them *inside* the scan where layout/fusion effects differ.
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

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
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
    valid = jnp.ones((b, chunk), bool)
    n_eps = 0 if g.folded else max(1, g.eps_depth)
    beam0, _ = B.init_beam_batch(b, g, opts, max(1, g.closure_sweeps + 1)
                                 if g.folded else n_eps)
    beam1, _, _ = B.decode_chunk(beam0, scores[:, :8], valid[:, :8], g, opts,
                                 n_eps)
    jax.block_until_ready(beam1)

    def score_onehot(s_t, pdf):
        fn = B.lookup_scores
        for _ in range(pdf.ndim - 2):
            fn = jax.vmap(fn)
        return fn(s_t, pdf)

    def score_gather(s_t, pdf):
        bb = pdf.shape[0]
        flat = pdf.reshape(bb, -1)
        return jnp.take_along_axis(s_t, flat, axis=-1).reshape(pdf.shape)

    def make_scan(score_fn, with_select):
        def step(bm, s_t):
            nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, _ = \
                B._expand(bm, g.emit, opts)
            ac = -score_fn(s_t, pdf)
            cand_cost = tok_cost[..., None] + weight + ac
            if not with_select:
                red = jnp.min(jnp.min(cand_cost, -1), -1)
                return B.Beam(bm.state,
                              bm.cost + 0e-30 * red[..., None]), None
            cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
            w2 = None if olabel2 is None else B._flat2(olabel2)
            out = B.select_beam(B._flat2(nxt), B._flat2(cand_cost),
                                B._flat2(cand_prev), B._flat2(olabel), k,
                                jnp.float32(opts.beam), word2=w2)
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
        print(f"{name:36s} {dt*1e3:9.2f} ms  ({dt/chunk*1e3:7.3f} ms/frame)")

    timeit("scan[score=onehot]", make_scan(score_onehot, False), beam1,
           scores)
    timeit("scan[score=gather]", make_scan(score_gather, False), beam1,
           scores)
    timeit("scan[score=onehot + select]", make_scan(score_onehot, True),
           beam1, scores)
    timeit("scan[score=gather + select]", make_scan(score_gather, True),
           beam1, scores)

    # sanity: identical costs
    s0 = scores[:, 0]
    nxt, pdf, *_ = B._expand(beam1, g.emit, opts)
    d = jnp.max(jnp.abs(score_onehot(s0, pdf) - score_gather(s0, pdf)))
    print("max |onehot - gather| =", float(d))


if __name__ == "__main__":
    main()
