"""Op-level device-time attribution for one pooled steady chunk.

Captures a jax.profiler trace of pool_decode_chunk at a given rung and
aggregates XLA op durations from the xplane proto, grouped by fusion name.
This is ground truth (device timeline), unlike ablation variants whose
fusion boundaries shift with what is disabled.

Usage: python scripts/trace_pool_chunk.py [kp] [frames] [batch] [K]
"""
import collections
import glob
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

from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.recognizer import Recognizer
from pocketkaldi_tpu.decoder.pooled import (
    GROUP, LANE_DEAD, PoolBeam, pool_decode_chunk)


def build_pool(kp, batch, g, rng):
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
    return PoolBeam(jnp.asarray(lane), jnp.asarray(state),
                    jnp.asarray(cost))


def parse_trace(logdir):
    """Aggregate device-op durations from the chrome-trace JSON the jax
    profiler writes (the xplane proto modules are not importable in this
    image)."""
    import gzip
    import json
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    totals = collections.Counter()
    counts = collections.Counter()
    for path in paths:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                names[e["pid"]] = e["args"].get("name", "?")
        for e in events:
            if e.get("ph") != "X":
                continue
            pname = names.get(e.get("pid"), "?")
            if "TPU" not in pname and "device" not in pname.lower():
                continue
            key = (pname, e.get("name", "?"))
            totals[key] += e.get("dur", 0) / 1e3   # ms
            counts[key] += 1
    return totals, counts


def main():
    kp = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 16384
    conf = os.path.join(CACHE, "benchmodel-p16-ws1-we0.3", "model.conf")
    rec = Recognizer.load(conf)
    rec.set_decoder_opts(DecoderOptions(
        max_active=k, expand_factor=8, chunk_frames=frames, pooled=True))
    dec = rec.decoder
    g, opts = dec.graph, dec.opts
    rng = np.random.default_rng(0)
    npdf = rec.am.num_pdfs
    scores = jnp.asarray(
        rng.standard_normal((batch, frames, npdf), dtype=np.float32))
    valid = jnp.ones((batch, frames), bool)
    pool0 = build_pool(kp, batch, g, rng)

    out = pool_decode_chunk(pool0, scores, valid, g, opts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = pool_decode_chunk(pool0, scores, valid, g, opts)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    print(f"warm chunk: {wall * 1e3:.1f} ms "
          f"({wall * 1e3 / frames:.2f} ms/frame)", flush=True)

    logdir = f"/tmp/pooltrace-{kp}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = pool_decode_chunk(pool0, scores, valid, g, opts)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    totals, counts = parse_trace(logdir)
    by_plane = collections.Counter()
    for (plane, name), ms in totals.items():
        by_plane[plane] += ms
    print("\n== device totals (ms) ==")
    for plane, ms in by_plane.most_common(4):
        print(f"{ms:10.2f}  {plane}")
    print("\n== top device ops (ms, count) ==")
    dev = [(ms, counts[k2], k2[1]) for k2, ms in totals.items()]
    dev.sort(reverse=True)
    for ms, n, name in dev[:40]:
        print(f"{ms:9.2f} {n:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
