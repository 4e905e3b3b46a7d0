"""Expansion-width ablation: dense block=16 vs budgeted flat block=8.

The folded bench graph's degree profile (mean 6.25, max 10) means the dense
16-lane blocks are ~60% pad; packing into 8-lane blocks (avg 1.02
blocks/state) with a flat budget cuts the candidate count from K*16 to
~K*10 — IF the flat path's cumsum+searchsorted overhead doesn't eat it.

All scans here RETURN the per-frame records so XLA cannot DCE the payload
sorts (stage timings without records understate select by ~0.3 ms/frame).
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


def build_graph_block(fst, tid2pdf, block):
    """GraphArrays.build with a forced emit block width."""
    tid2pdf = np.asarray(tid2pdf, dtype=np.int32)
    s = fst.num_states
    src = fst.arc_source
    is_emit = fst.ilabel != 0
    e_src = src[is_emit]
    fold = B._fold_closure(fst, e_src, fst.next_state[is_emit],
                           tid2pdf[fst.ilabel[is_emit]],
                           fst.olabel[is_emit], fst.weight[is_emit], 3.0)
    e_src, e_nxt, e_pdf, e_ol, e_ol2, e_w = fold
    emit = B._build_blocks(s, e_src, e_nxt, e_pdf, e_ol, e_w, e_ol2,
                           block=block)
    eps_idx = np.nonzero(~is_emit)[0]
    eps = B._build_blocks(s, src[eps_idx], fst.next_state[eps_idx], None,
                          fst.olabel[eps_idx], fst.weight[eps_idx],
                          with_pdf=False)
    return B.GraphArrays(emit=emit, eps=eps, final=jnp.asarray(fst.final),
                         start_state=int(fst.start_state),
                         eps_depth=int(fst.eps_depth), folded=True,
                         eps_bounded=bool(fst.eps_depth_bounded),
                         closure_sweeps=int(fst.eps_closure["sweeps"]))


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
    g16 = B.GraphArrays.build(rec.fst, rec.am.tid2pdf, fold_eps=True)
    g8 = build_graph_block(rec.fst, rec.am.tid2pdf, 8)
    print(f"g16: block={g16.emit.block} mb={g16.emit.max_blocks} "
          f"N={k*g16.emit.max_blocks*g16.emit.block}")
    print(f"g8:  block={g8.emit.block} mb={g8.emit.max_blocks} "
          f"rows={g8.emit.packed.shape[0]}")

    p = rec.am.num_pdfs
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, chunk, p).astype(np.float32) * 4.0)
    scores = jax.nn.log_softmax(logits, axis=-1) * 0.1
    valid = jnp.ones((b, chunk), bool)
    n_eps = 0
    beam0, _ = B.init_beam_batch(b, g16, opts, max(1, g16.closure_sweeps + 1))
    beam1, _, _ = B.decode_chunk(beam0, scores[:, :8], valid[:, :8], g16,
                                 opts, n_eps)
    jax.block_until_ready(beam1)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:42s} {dt*1e3:9.2f} ms  ({dt/chunk*1e3:7.3f} ms/frame)")

    # full real chunk at both block widths (records kept)
    f16 = jax.jit(lambda bm, s: B.decode_chunk(bm, s, valid, g16, opts, 0))
    timeit("decode_chunk dense block=16", f16, beam1, scores)

    # flat block=8 with varying budgets: custom frame step mirroring
    # frame_step's folded path but forcing expand_blocks.
    def make_flat(g, eb):
        def step(bm, s_t):
            slots = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32),
                                     bm.state.shape)
            fn = lambda st, c, sl: B.expand_blocks(st, c, sl, g.emit, eb)
            for _ in range(bm.state.ndim - 1):
                fn = jax.vmap(fn)
            nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, ov = \
                fn(bm.state, bm.cost, slots)
            ac = -jax.vmap(B.lookup_scores)(s_t, pdf)
            cand_cost = tok_cost[..., None] + weight + ac
            cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
            w2 = None if olabel2 is None else B._flat2(olabel2)
            out = B.select_beam(B._flat2(nxt), B._flat2(cand_cost),
                                B._flat2(cand_prev), B._flat2(olabel), k,
                                jnp.float32(opts.beam), word2=w2)
            nb, prev0, word0, word2_0 = out
            id_slot = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32),
                                       (b, k))
            rec_prev = jnp.stack([prev0, id_slot], axis=1)
            rec_word = jnp.stack([word0, word2_0], axis=1)
            return nb, (B.StepRecord(rec_prev, rec_word), ov)

        def run(bm, s):
            nb, (recs, ovs) = jax.lax.scan(step, bm, jnp.swapaxes(s, 0, 1))
            return nb, recs, ovs
        return jax.jit(run)

    for eb in (1280, 1536, 2048):
        fn = make_flat(g8, eb)
        nb, recs, ovs = fn(beam1, scores)
        ov_frames = int(jnp.sum(jnp.any(ovs, axis=-1)))
        timeit(f"flat block=8 eb={eb} (N={eb*8})", fn, beam1, scores)
        print(f"    overflow frames: {ov_frames}/{chunk}")

    # dense-16 equivalent custom step (same harness, sanity of comparison)
    def make_dense(g):
        def step(bm, s_t):
            nb, rec, ov = B.frame_step(bm, s_t, jnp.ones((b,), bool), g,
                                       opts, 0)
            return nb, (rec, ov)

        def run(bm, s):
            nb, (recs, ovs) = jax.lax.scan(step, bm, jnp.swapaxes(s, 0, 1))
            return nb, recs, ovs
        return jax.jit(run)
    timeit("dense block=16 (same harness)", make_dense(g16), beam1, scores)

    # beam equivalence dense vs flat on the final beam
    nb16, _, _ = make_dense(g16)(beam1, scores)
    nb8, _, _ = make_flat(g8, 2048)(beam1, scores)
    same = (bool(jnp.array_equal(nb16[0].state, nb8[0].state)) and
            bool(jnp.allclose(nb16[0].cost, nb8[0].cost, atol=1e-5)))
    print("final beams agree (dense16 vs flat8):", same)


if __name__ == "__main__":
    main()
