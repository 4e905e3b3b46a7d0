"""Sort cost vs length vs batching — the B=128 flat-scaling diagnosis.

VERDICT r4 weak #2: B=128 delivered 46.6 audio-s/s vs 47.3 at B=32 (0.98x
for 4x the batch), while the pooled design promises law-of-large-numbers
smoothing.  The frame step's cost is two big sorts (A: dedup, 3 operands;
B: rank, 4 operands) whose length n = Kp * expand scales LINEARLY with
batch (demand-priced pool).  If device sort cost is superlinear in n
(bitonic-family networks are O(n log^2 n)), then 4x the lanes costs
>4x the sort wall and exactly cancels the launch-overhead amortization —
flat scaling.

This probe measures it directly: the two frame-step sorts at the bench's
real operand mix, flat length n vs the SAME elements batched as (G, n/G)
rows (XLA sorts batch rows independently: G networks of depth
log^2(n/G), one launch).  If batched rows win, the fix is a grouped pool
(independent 32-lane sub-pools with a leading group axis), not a bigger
shared pool.

Usage: python scripts/probe_sort_scaling.py           # on the TPU
"""
import os
import sys
import functools
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".cache", "jaxcache"))

# n emulates the pooled select at bench shapes: Kp * 16 candidate rows
# (mb*arcs = 16 on the bench graph).  B=32 steady rung Kp~24576 -> n=393k;
# B=128 -> 4x.
# Trimmed matrix: every (size, G, sort) cell is a fresh multi-minute
# tunneled compile, so the probe measures only the decision-relevant
# cells — the B=32 scale (flat baseline) and the B=128 scale flat vs
# 4-way grouped.  Override via PKTPU_PROBE_SIZES / _GROUPS.
SIZES = tuple(int(s) for s in os.environ.get(
    "PKTPU_PROBE_SIZES", "393216,1572864").split(","))
GROUPS = tuple(int(g) for g in os.environ.get(
    "PKTPU_PROBE_GROUPS", "1,4").split(","))
REPS = int(os.environ.get("PKTPU_PROBE_REPS", "10"))


def _sync(out):
    # axon's block_until_ready does NOT block; a scalar fetch orders
    # behind the in-order device queue (see bench.py run_latency_rung)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timed(fn, *args):
    _sync(fn(*args))                          # compile + sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / REPS * 1000


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  reps={REPS}")
    print(f"{'n':>9} {'G':>2} {'rows':>8} | {'sortA3 ms':>9} {'sortB4 ms':>9}"
          f" | {'vs flat':>7}")
    base = {}
    for n in SIZES:
        combo = rng.integers(0, 1 << 24, size=n).astype(np.int32)
        cost = rng.standard_normal(n).astype(np.float32)
        idx = np.arange(n, dtype=np.int32)
        lane = np.sort(rng.integers(0, 128, size=n)).astype(np.int32)
        state = rng.integers(0, 1 << 20, size=n).astype(np.int32)
        for g in GROUPS:
            if n % g:
                continue
            sh = (g, n // g) if g > 1 else (n,)
            ca, co, ix = (jnp.asarray(a.reshape(sh))
                          for a in (combo, cost, idx))
            la, st = (jnp.asarray(a.reshape(sh)) for a in (lane, state))

            @jax.jit
            def sort_a(ca, co, ix):
                return jax.lax.sort((ca, co, ix), num_keys=2,
                                    is_stable=True)

            @jax.jit
            def sort_b(la, co, st, ix):
                return jax.lax.sort((la, co, st, ix), num_keys=2,
                                    is_stable=True)

            ta = timed(sort_a, ca, co, ix)
            tb = timed(sort_b, la, co, st, ix)
            if g == 1:
                base[n] = ta + tb
            ratio = (ta + tb) / base[n]
            print(f"{n:>9} {g:>2} {sh[-1]:>8} | {ta:9.2f} {tb:9.2f}"
                  f" | {ratio:7.2f}x")
    # the cross-size flat scaling: cost(4n)/cost(n) per element
    if len(SIZES) >= 2 and SIZES[0] in base and SIZES[-1] in base:
        f = SIZES[-1] / SIZES[0]
        r = base[SIZES[-1]] / base[SIZES[0]]
        print(f"\nflat {SIZES[-1]}/{SIZES[0]}: {r:.2f}x the wall for "
              f"{f:g}x the elements -> {r / f:.2f}x per element")


if __name__ == "__main__":
    main()
