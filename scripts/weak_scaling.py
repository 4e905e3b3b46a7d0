"""Controlled virtual-mesh scaling-efficiency experiment (pooled sharded
steady step).

BASELINE.md's ≥80% 1-chip→N scaling gate cannot be measured on real
hardware here (one chip); this script produces the measured stand-in
(VERDICT r4 next #7):

  1. ZERO collectives in the compiled steady-chunk program at every shard
     count (also asserted by tests/test_streaming_pooled.py) — on real
     hardware the steady step therefore never touches ICI;
  2. CONTROLLED efficiency sweep: fixed per-shard load (identical
     program, identical shapes on every shard), data axis h = 1/2/4/8 on
     the forced-host-device mesh.  Perfect scaling on a c-core host is
     the time-sharing ideal t(1)·max(1, h/c); efficiency(h) = ideal/t(h)
     isolates the overhead the data partition itself adds (GSPMD glue,
     per-shard dispatch) from core time-sharing.  h=2 on this 2-core host
     is the one point where shards truly run in parallel — the honest
     gate number (measured 89.8%; h=4/8 amortize dispatch and sit at
     ~101%).
  3. secondary fixed-TOTAL-work sweep: partitioning also REDUCES
     per-step work (sort cost is superlinear in pool length), i.e. the
     mesh direction is favorable beyond raw parallelism.

Writes bench_cache/weak_scaling.json, which bench.py attaches to its
result line.  Run standalone:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/weak_scaling.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"   # ambient env presets axon — force
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

# sitecustomize imports jax before this script body runs, so the env var
# alone is too late — mirror tests/conftest.py and force the config too.
jax.config.update("jax_platforms", "cpu")

from pocketkaldi_tpu.decoder.streaming_pooled import (PooledStreamingDecoder,
                                                      _sharded_chunk)
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.parallel.mesh import make_mesh
from pocketkaldi_tpu.tools.make_fixtures import make_decoding_graph

P = 16
B_LOC = 8
CHUNK = 16
COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter", "collective-broadcast")


def _bench_step(sd, rng, b_loc, h, reps=20):
    sc = sd._put(jax.numpy.asarray(
        rng.randn(h, b_loc, CHUNK, P).astype(np.float32) * 2.0))
    vd = sd._put(jax.numpy.ones((h, b_loc, CHUNK), bool))
    comp = _sharded_chunk.lower(sd.pools, sc, vd, sd.graph,
                                sd.opts).compile()
    ncoll = sum(comp.as_text().count(op) for op in COLLECTIVES)
    out = _sharded_chunk(sd.pools, sc, vd, sd.graph, sd.opts)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):                    # best-of-3 batches of reps
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _sharded_chunk(sd.pools, sc, vd, sd.graph, sd.opts)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, ncoll


def _session(fst, tid2pdf, opts, h, b_loc):
    mesh = make_mesh(jax.devices()[:h], model_parallel=1)
    sd = PooledStreamingDecoder(fst, tid2pdf, opts, num_lanes=h * b_loc,
                                mesh=mesh)
    for lane in range(h * b_loc):
        sd.attach(lane, f"u{lane}")
    sd._flush_attaches()
    return sd


def main():
    for seed in range(90, 140):
        rng = np.random.RandomState(seed)
        fst = make_decoding_graph(rng, 60, 40, 12)
        if fst.eps_closure is not None:
            break
    tid2pdf = rng.randint(0, P, size=41).astype(np.int32)
    opts = DecoderOptions(max_active=128, expand_factor=8,
                          chunk_frames=CHUNK, fold_eps=True)
    result = {"cores": os.cpu_count(), "chunk_frames": CHUNK, "p": P}

    cores = os.cpu_count() or 1

    # --- controlled sweep (VERDICT r4 next #7): fixed PER-SHARD load ----
    # Every shard runs the IDENTICAL program on identical shapes (B_LOC
    # lanes, same pool size); only the shard count changes.  On a c-core
    # host the perfect-scaling wall is the TIME-SHARING ideal
    #   ideal(h) = t(1) · max(1, h / c)
    # (shards beyond the core count serialize; sharding itself should add
    # nothing).  efficiency(h) = ideal(h) / t(h): every % below 100 is
    # overhead the data partition added — GSPMD glue, per-shard dispatch —
    # exactly the term real multi-chip hardware would add ICI collectives
    # to, and the compiled program has ZERO of those (asserted below).
    print(f"-- fixed PER-SHARD load: {B_LOC} lanes/shard, {cores} cores --")
    weak_rows = []
    for h in (1, 2, 4, 8):
        sd = _session(fst, tid2pdf, opts, h, B_LOC)
        dt, ncoll = _bench_step(sd, rng, B_LOC, h)
        weak_rows.append((h, dt, ncoll))
    t1 = weak_rows[0][1]
    effs = {}
    for h, dt, ncoll in weak_rows:
        ideal = t1 * max(1.0, h / cores)
        effs[h] = ideal / dt
        print(f"data={h}: {dt * 1e3:8.2f} ms/chunk  "
              f"(ideal {ideal * 1e3:6.2f})  efficiency={effs[h]:6.1%}  "
              f"collectives={ncoll}")
    hs = np.array([r[0] for r in weak_rows], float)
    ts = np.array([r[1] for r in weak_rows], float)
    slope, intercept = np.polyfit(hs, ts, 1)
    print(f"linear fit t(h) = {intercept * 1e3:.2f} ms + "
          f"{slope * 1e3:.2f} ms * h   (t(1) = {ts[0] * 1e3:.2f} ms)")
    result["weak"] = [
        {"shards": h, "ms_per_chunk": round(dt * 1e3, 2), "collectives": nc,
         "efficiency_pct": round(effs[h] * 100, 1)}
        for h, dt, nc in weak_rows]
    result["weak_fit_intercept_ms"] = round(intercept * 1e3, 2)
    result["weak_fit_slope_ms"] = round(slope * 1e3, 2)

    # --- secondary sweep: FIXED TOTAL work, partition count swept ------
    # Total lanes constant, so per-shard pools SHRINK with h: this mixes
    # the sharding term with the sort-length term (sort cost is
    # superlinear in pool length), so it is NOT an efficiency measurement
    # — it documents that partitioning also *reduces per-step work* on
    # this decoder, i.e. the mesh direction is favorable beyond raw
    # parallelism.
    total = 8 * B_LOC
    print(f"\n-- fixed TOTAL work: {total} lanes, partitions swept --")
    fixed_rows = []
    for h in (1, 2, 4, 8):
        sd = _session(fst, tid2pdf, opts, h, total // h)
        dt, ncoll = _bench_step(sd, rng, total // h, h)
        fixed_rows.append((h, dt, ncoll))
        print(f"data={h}: {dt * 1e3:8.2f} ms/chunk  collectives={ncoll}  "
              f"speedup vs 1-shard={fixed_rows[0][1] / dt:5.2f}x")
    result["fixed_total"] = [
        {"shards": h, "ms_per_chunk": round(dt * 1e3, 2),
         "collectives": nc,
         "speedup_vs_1shard": round(fixed_rows[0][1] / dt, 2)}
        for h, dt, nc in fixed_rows]

    assert all(r[2] == 0 for r in fixed_rows + weak_rows), \
        "collectives appeared!"
    result["zero_collectives"] = True
    # the gate stand-in: worst efficiency across the sweep
    result["efficiency_min_pct"] = round(min(effs.values()) * 100, 1)
    result["efficiency_8_shards_pct"] = round(effs[8] * 100, 1)

    out_path = os.path.join(REPO, "bench_cache", "weak_scaling.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    import json
    with open(out_path, "w") as fd:
        json.dump(result, fd, indent=1)
    print(f"\nwrote {out_path}: 8-shard efficiency "
          f"{result['efficiency_min_pct']}% (min), "
          f"{result['efficiency_8_shards_pct']}% (8 shards)")


if __name__ == "__main__":
    main()
