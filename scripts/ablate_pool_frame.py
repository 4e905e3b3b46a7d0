"""In-frame cost attribution for the pooled frame step, on the real backend.

Builds variants of pool_frame_step with later stages disabled and times a
64-frame chunk scan of each at a fixed pool rung, on the bench graph with
random scores/pool.  Stages: expansion+scoring -> sort A (dedup) ->
sort B (rank/prune) -> sort C (placement).  Differences between adjacent
variants attribute the per-frame cost to a single stage.

Variant outputs are garbage (later stages skipped); only timing matters.
Each variant carries the full frame state through the scan so XLA cannot
dead-code-eliminate the stage under test: the stage's arrays fold into a
checksum that rides the carry.

Usage: python scripts/ablate_pool_frame.py [kp] [frames] [batch] [K]
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

from functools import partial

from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.recognizer import Recognizer
from pocketkaldi_tpu.decoder import pooled
from pocketkaldi_tpu.decoder.pooled import (
    GROUP, LANE_DEAD, PoolBeam, _expand_pool, _score_groups,
    _lane_table_lookup, _rank_and_place)
from pocketkaldi_tpu.decoder.beam import _first_of_run, INT_MAX


def make_step(g, opts, stage: str):
    """pool_frame_step truncated after ``stage``."""
    import numpy as _np
    s_plus = int(_np.int64(g.final.shape[0])) + 1

    def step(pool, scores_t, frame_valid):
        b = scores_t.shape[0]
        kp = pool.state.shape[0]
        cap = min(opts.max_active, kp)
        nxt, pdf, olabel, olabel2, weight, tok_cost, tok_slot, tok_lane = \
            _expand_pool(pool, g.emit)
        n = nxt.shape[0] * nxt.shape[1]
        arcs = nxt.shape[1]
        ng = kp // GROUP
        group_lane = pool.lane[::GROUP]
        ac = _score_groups(scores_t, pdf.reshape(ng, -1), group_lane)
        ac = ac.reshape(nxt.shape)
        cand_cost = tok_cost[:, None] + weight - ac
        c_state = nxt.reshape(n)
        c_cost = cand_cost.reshape(n)
        c_lane = jnp.repeat(tok_lane, arcs, total_repeat_length=n)
        c_prev = jnp.repeat(tok_slot, arcs, total_repeat_length=n)
        c_word = olabel.reshape(n)
        keep_valid = _lane_table_lookup(frame_valid.astype(jnp.float32),
                                        pool.lane) > 0.5
        mb = nxt.shape[0] // kp
        cand_valid = jnp.repeat(
            jnp.repeat(keep_valid, mb, total_repeat_length=nxt.shape[0]),
            arcs, total_repeat_length=n)
        c_cost = jnp.where(cand_valid, c_cost, jnp.inf)
        k_cost = jnp.where(keep_valid | (pool.state < 0), jnp.inf, pool.cost)
        all_state = jnp.concatenate([c_state, pool.state])
        all_cost = jnp.concatenate([c_cost, k_cost])
        all_lane = jnp.concatenate([c_lane, pool.lane])
        all_prev = jnp.concatenate([c_prev, jnp.arange(kp, dtype=jnp.int32)])
        all_word = jnp.concatenate([c_word, jnp.zeros(kp, jnp.int32)])
        if stage == "expand":
            # fold candidates into a pseudo-pool so the carry stays (kp,);
            # state is perturbed too so the expansion gather is not
            # loop-invariant (XLA would hoist it out of the scan)
            chk = all_cost[:kp] + all_lane[:kp] + all_prev[:kp] + \
                all_word[:kp]
            ichk = all_state[:kp]
            return PoolBeam(pool.lane, pool.state + 0 * ichk,
                            pool.cost + 0.0 * chk)
        finite = jnp.isfinite(all_cost)
        combo = jnp.where(finite,
                          all_lane * s_plus + jnp.maximum(all_state, 0),
                          INT_MAX)
        sA = jax.lax.sort((combo, all_cost, all_prev, all_word),
                          num_keys=2, is_stable=True)
        a_combo, a_cost = sA[0], sA[1]
        keep = _first_of_run(a_combo) & (a_combo != INT_MAX)
        a_lane = jnp.where(keep, a_combo // s_plus, LANE_DEAD)
        a_state = jnp.where(keep, a_combo % s_plus, -1)
        a_cost = jnp.where(keep, a_cost, jnp.inf)
        if stage == "sortA":
            chk = a_cost[:kp]
            ichk = a_lane[:kp] + a_state[:kp] + sA[2][:kp] + sA[3][:kp]
            return PoolBeam(pool.lane, pool.state + 0 * ichk,
                            pool.cost + 0.0 * chk)
        if stage == "sortB":
            sB = jax.lax.sort((a_lane, a_cost, a_state) + tuple(sA[2:]),
                              num_keys=2, is_stable=True)
            chk = sB[1][:kp]
            ichk = sB[0][:kp] + sB[2][:kp] + sB[3][:kp] + sB[4][:kp]
            return PoolBeam(pool.lane, pool.state + 0 * ichk,
                            pool.cost + 0.0 * chk)
        # full: sorts B + C via the production _rank_and_place
        pool2, placed, ov, dem, _cnt = _rank_and_place(
            a_lane, a_cost, a_state, sA[2:], b, cap, kp,
            jnp.float32(opts.beam))
        chk = placed[0] + placed[1] + 0.0 * dem
        return PoolBeam(pool2.lane, pool2.state,
                        pool2.cost + 0.0 * chk[:kp])

    return step


def main():
    kp = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 16384
    conf = os.path.join(CACHE, "benchmodel-p16-ws1-we0.3", "model.conf")
    rec = Recognizer.load(conf)
    rec.set_decoder_opts(DecoderOptions(
        max_active=k, expand_factor=8, chunk_frames=64, pooled=True))
    dec = rec.decoder
    g, opts = dec.graph, dec.opts
    p_np = int(g.emit.packed.shape[-1])
    print(f"backend={jax.default_backend()} kp={kp} frames={frames} "
          f"B={batch} K={k} mb={g.emit.max_blocks} "
          f"block={g.emit.block} planes={g.emit.num_planes}", flush=True)

    rng = np.random.default_rng(0)
    npdf = rec.am.num_pdfs
    scores = jnp.asarray(
        rng.standard_normal((batch, frames, npdf), dtype=np.float32))
    valid = jnp.ones((batch, frames), bool)
    # a plausible live pool: ~kp/2 live tokens spread lane-major
    per_lane = kp // 2 // batch // GROUP * GROUP
    lane = np.full(kp, LANE_DEAD, np.int32)
    state = np.full(kp, -1, np.int32)
    cost = np.full(kp, np.inf, np.float32)
    ns = int(g.final.shape[0])
    pos = 0
    for l in range(batch):
        lane[pos:pos + per_lane] = l
        live = per_lane * 3 // 4
        state[pos:pos + live] = rng.choice(ns, live, replace=False)
        cost[pos:pos + live] = np.sort(
            rng.random(live).astype(np.float32) * 8.0)
        pos += per_lane
    pool0 = PoolBeam(jnp.asarray(lane), jnp.asarray(state),
                     jnp.asarray(cost))

    for stage in ("noop", "expand", "sortA", "sortB", "full"):
        if stage == "noop":
            def step(pool, s_t, v_t):
                return PoolBeam(pool.lane, pool.state,
                                pool.cost + jnp.sum(s_t) * 0.0)
        else:
            step = make_step(g, opts, stage)

        @partial(jax.jit, donate_argnums=())
        def chunk(pool, scores, valid, _step=step):
            def body(p, xs):
                s_t, v_t = xs
                return _step(p, s_t, v_t), ()
            out, _ = jax.lax.scan(
                body, pool, (jnp.swapaxes(scores, 0, 1),
                             jnp.swapaxes(valid, 0, 1)))
            return out

        t0 = time.perf_counter()
        out = chunk(pool0, scores, valid)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = chunk(pool0, scores, valid)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{stage:8s}: {dt * 1e3 / frames:7.3f} ms/frame "
              f"(chunk {dt * 1e3:.1f} ms, first-call {t_compile:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
