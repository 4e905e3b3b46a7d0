"""Micro-benchmark: Pallas fused_cand_cost vs XLA one-hot lookup_scores.

Shapes mirror the bench parity config: B lanes, N = K*mb*block candidates,
P = 3448 pdfs.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pocketkaldi_tpu.decoder import beam as B
from pocketkaldi_tpu.ops import score_fuse


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return out, dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    p = 3448
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(b, p).astype(np.float32))
    pdf = jnp.asarray(rng.randint(0, p, (b, n), dtype=np.int32))
    weight = jnp.asarray(rng.rand(b, n).astype(np.float32))
    tok = jnp.asarray(rng.rand(b, n).astype(np.float32) * 10)

    print(f"B={b} N={n} P={p} backend={jax.default_backend()}")
    print("pallas available:", score_fuse.available())

    xla = jax.jit(lambda s, i, w, t: t + w -
                  jax.vmap(B.lookup_scores)(s, i))
    o1, _ = timeit("XLA one-hot lookup + elementwise", xla, scores, pdf,
                   weight, tok)

    gather = jax.jit(score_fuse.reference_cand_cost)
    o2, _ = timeit("XLA plain gather + elementwise", gather, scores, pdf,
                   weight, tok)

    if score_fuse.available():
        pk = jax.jit(lambda s, i, w, t:
                     score_fuse.fused_cand_cost(s, i, w, t))
        o3, _ = timeit("Pallas fused_cand_cost", pk, scores, pdf, weight, tok)
        print("pallas == gather:",
              bool(jnp.array_equal(o3, o2)))
    print("onehot ~= gather:",
          float(jnp.max(jnp.abs(o1 - o2))))


if __name__ == "__main__":
    main()
