"""Frame-step ablation profiler for the decoder hot loop.

Times the decode frame step and its components in isolation on the current
backend at the bench parity config, so optimization work (Pallas kernels,
layout changes) is driven by measurement instead of guesses.  Whole-chunk
repeats are used because micro-timings on the tunneled TPU are unstable
(docs/PERFORMANCE.md).

Usage:  python scripts/profile_frame.py [B] [K]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk = 64

    from pocketkaldi_tpu.hparams import DecoderOptions
    from pocketkaldi_tpu.recognizer import Recognizer
    from pocketkaldi_tpu.decoder import beam as B
    from pocketkaldi_tpu.tools.make_fixtures import write_bench_model

    pack = {"peakiness": 16.0, "weight_spread": 1.0, "word_on_emit": 0.3}
    tag = "p{peakiness:g}-ws{weight_spread:g}-we{word_on_emit:g}".format(
        **pack)
    model_dir = os.path.join(CACHE, f"benchmodel-{tag}")
    conf = os.path.join(model_dir, "model.conf")
    if not os.path.exists(conf):
        print("generating bench pack...", file=sys.stderr)
        write_bench_model(model_dir, seed=0, **pack)

    rec = Recognizer.load(conf)
    opts = DecoderOptions(max_active=k, expand_factor=8, chunk_frames=chunk)
    g = B.GraphArrays.build(rec.fst, rec.am.tid2pdf, fold_eps=opts.fold_eps)
    print(f"graph: folded={g.folded} emit block={g.emit.block} "
          f"max_blocks={g.emit.max_blocks} "
          f"rows={g.emit.packed.shape} planes={g.emit.num_planes}",
          file=sys.stderr)
    p = rec.am.num_pdfs

    rng = np.random.RandomState(0)
    # Realistic peaked scores: the AM emits log p(pdf|x) - log prior.
    logits = jnp.asarray(rng.randn(b, chunk, p).astype(np.float32) * 4.0)
    scores = jax.nn.log_softmax(logits, axis=-1) * 0.1
    valid = jnp.ones((b, chunk), bool)

    n_eps = 0 if g.folded else max(1, g.eps_depth)
    beam0, _ = B.init_beam_batch(b, g, opts, max(1, g.closure_sweeps + 1)
                                 if g.folded else n_eps)
    # Advance a few frames so the beam is full (representative occupancy).
    beam1, _, _ = B.decode_chunk(beam0, scores[:, :8], valid[:, :8], g, opts,
                                 n_eps)
    jax.block_until_ready(beam1)
    occ = int(jnp.sum(beam1.state >= 0, axis=-1).mean())
    print(f"beam occupancy after 8 frames: {occ}/{k}", file=sys.stderr)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:44s} {dt*1e3:9.2f} ms   ({dt/chunk*1e3:7.3f} ms/frame)")
        return dt

    # --- full chunk ---
    full = jax.jit(lambda bm, s: B.decode_chunk(bm, s, valid, g, opts, n_eps))
    timeit("decode_chunk (full)", full, beam1, scores)

    # --- scan of emitting-only frame steps, component-ablated ---
    def make_scan(stage):
        def step(bm, s_t):
            nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, _ov = \
                B._expand(bm, g.emit, opts)
            if stage == "expand":
                # fold outputs into a fake beam to keep the scan honest
                red = jnp.sum(weight, axis=(-1, -2)) + jnp.sum(tok_cost, -1)
                return Beam2(bm.state, bm.cost + 0e-30 * red[..., None]), None
            score_fn = B.lookup_scores
            for _ in range(bm.state.ndim - 1):
                score_fn = jax.vmap(score_fn)
            ac = -score_fn(s_t, pdf)
            cand_cost = tok_cost[..., None] + weight + ac
            if stage == "score":
                red = jnp.min(jnp.min(cand_cost, -1), -1)
                return Beam2(bm.state, bm.cost + 0e-30 * red[..., None]), None
            cand_prev = jnp.broadcast_to(tok_slot[..., None], nxt.shape)
            w2 = None if olabel2 is None else B._flat2(olabel2)
            out = B.select_beam(B._flat2(nxt), B._flat2(cand_cost),
                                B._flat2(cand_prev), B._flat2(olabel), k,
                                jnp.float32(opts.beam), word2=w2)
            return out[0], None

        def run(bm, s):
            return jax.lax.scan(step, bm, jnp.swapaxes(s, 0, 1))[0]
        return jax.jit(run)

    global Beam2
    Beam2 = B.Beam
    for stage in ("expand", "score", "select"):
        timeit(f"scan[{stage}] (emit path cumulative)", make_scan(stage),
               beam1, scores)

    # --- isolated primitives at candidate scale ---
    mb = max(1, g.emit.max_blocks)
    n = k * mb * g.emit.block
    print(f"candidates per lane N = {n}", file=sys.stderr)
    cand_state = jnp.asarray(rng.randint(0, rec.fst.num_states, (b, n),
                                         dtype=np.int32))
    cand_cost = jnp.asarray(rng.rand(b, n).astype(np.float32) * 30)
    cand_pdf = jnp.asarray(rng.randint(0, p, (b, n), dtype=np.int32))
    payload = jnp.zeros((b, n), jnp.int32)

    sel = jax.jit(lambda st, c, pl: B.select_beam(
        st, c, pl, pl, k, jnp.float32(16.0), word2=pl))
    timeit("select_beam alone (5 operands)", sel, cand_state, cand_cost,
           payload)

    look = jax.jit(jax.vmap(B.lookup_scores))
    timeit("lookup_scores alone", look, scores[:, 0], cand_pdf)

    rows = jax.jit(lambda idx: g.emit.packed[idx])
    ridx = jnp.asarray(rng.randint(0, g.emit.packed.shape[0], (b * k * mb,),
                                   dtype=np.int32))
    timeit("row gather alone (K*mb rows/lane)", rows, ridx)


if __name__ == "__main__":
    main()
