"""Virtual-mesh weak-scaling curve for the pooled sharded steady step.

BASELINE.md's ≥80% 1-chip→N scaling gate cannot be measured in this
environment (one real chip); this script provides the evidence that IS
measurable here (VERDICT r3 next #8):

  1. the compiled steady-chunk program contains ZERO collectives at every
     shard count (also asserted by tests/test_streaming_pooled.py);
  2. weak scaling on the virtual CPU mesh: B_loc lanes per shard, data axis
     h = 1/2/4/8.  The host has few cores, so virtual shards largely
     SERIALIZE — perfect weak scaling on a serializing host is wall time
     LINEAR in h with near-zero intercept (slope ≈ the single-shard time);
     a superlinear term or large intercept would expose hidden cross-shard
     synchronization.  We report per-chunk wall time, the per-shard
     normalized time t(h)/h, and the linear fit.

Run with the test harness's virtual device env:
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


def main():
    for seed in range(90, 140):
        rng = np.random.RandomState(seed)
        fst = make_decoding_graph(rng, 60, 40, 12)
        if fst.eps_closure is not None:
            break
    tid2pdf = rng.randint(0, P, size=41).astype(np.int32)
    opts = DecoderOptions(max_active=128, expand_factor=8,
                          chunk_frames=CHUNK, fold_eps=True)
    rows = []
    for h in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:h], model_parallel=1)
        sd = PooledStreamingDecoder(fst, tid2pdf, opts,
                                    num_lanes=h * B_LOC, mesh=mesh)
        for lane in range(h * B_LOC):
            sd.attach(lane, f"u{lane}")
        sd._flush_attaches()
        sc = sd._put(jax.numpy.asarray(
            rng.randn(h, B_LOC, CHUNK, P).astype(np.float32) * 2.0))
        vd = sd._put(jax.numpy.ones((h, B_LOC, CHUNK), bool))
        comp = _sharded_chunk.lower(sd.pools, sc, vd, sd.graph,
                                    sd.opts).compile()
        ncoll = sum(comp.as_text().count(op) for op in COLLECTIVES)
        out = _sharded_chunk(sd.pools, sc, vd, sd.graph, sd.opts)
        jax.block_until_ready(out)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _sharded_chunk(sd.pools, sc, vd, sd.graph, sd.opts)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        rows.append((h, dt, ncoll))
        print(f"data={h}: {dt * 1e3:8.2f} ms/chunk  "
              f"({dt * 1e3 / h:6.2f} ms/shard)  collectives={ncoll}")

    hs = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    slope, intercept = np.polyfit(hs, ts, 1)
    print(f"\nlinear fit t(h) = {intercept * 1e3:.2f} ms + "
          f"{slope * 1e3:.2f} ms * h   (t(1) = {ts[0] * 1e3:.2f} ms)")
    print(f"intercept / t(1) = {intercept / ts[0]:+.2%}  "
          f"(near zero = no cross-shard synchronization term)")
    assert all(r[2] == 0 for r in rows), "collectives appeared!"


if __name__ == "__main__":
    main()
