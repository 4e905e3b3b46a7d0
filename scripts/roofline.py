"""MFU / roofline account for the bench workload (VERDICT r3 next #2).

Produces the host-independent speed statement BENCH's ``vs_baseline`` cannot
be (the reference's CPU differs per host): achieved fraction of this chip's
compute (MXU) and memory (HBM) ceilings per pipeline phase, and the
speed-of-light audio-s/s those ceilings imply for the measured decode
schedule.

Three measurements, all on the real backend:

  1. NNET MFU — the AM GEMM stack timed alone; FLOPs are exact from the
     layer dims.  Peaks used (TPU v5e, public numbers): 197 TFLOP/s bf16
     MXU; f32 with Precision.HIGHEST runs the 6-pass bf16 emulation
     (~197/6 ≈ 33 TFLOP/s effective ceiling).
  2. Decode sort throughput — the frame step is sort-dominated (op-level
     trace, docs/PERFORMANCE.md r4); we time the exact (keys, operands,
     length-family) sorts the frame step issues and report bytes-through-
     the-sort-network per second vs the 819 GB/s HBM ceiling.
  3. Whole-frame-step roofline — minimum single-touch HBM traffic per
     frame at each pool rung (expansion rows + candidate planes + sort
     read/write at the measured effective pass count) vs the measured
     per-frame time → achieved GB/s and the implied ceiling audio-s/s.

Usage: python scripts/roofline.py  (TPU; ~2 min warm)
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

HBM_GBS = 819.0          # TPU v5e HBM bandwidth, GB/s
PEAK_BF16 = 197e12       # TPU v5e MXU, FLOP/s
PEAK_F32 = PEAK_BF16 / 6  # Precision.HIGHEST 6-pass emulation ceiling

B = 32
T = 498                  # frames per 5 s utterance
SECONDS = 5.0


def timed(f, *args, iters=32):
    """Per-execution device time via in-order queue differencing.

    On the tunneled axon backend ``block_until_ready`` does NOT actually
    block (measured: a 194-GFLOP matmul stack 'finished' in 0.1 ms =
    9× bf16 peak) — only fetching a result synchronizes.  TPU execution
    is in-order, so fetching the LAST result of an n-deep chain waits for
    all n; t_exec = (T(n2) − T(n1)) / (n2 − n1) cancels dispatch + fetch
    latency.  ``f`` must return a SCALAR."""
    float(f(*args))                       # warm + compile

    def chain(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = f(*args)
        float(r)                          # one fetch syncs the whole queue
        return time.perf_counter() - t0

    n1, n2 = max(2, iters // 8), iters
    t1 = min(chain(n1) for _ in range(3))
    t2 = min(chain(n2) for _ in range(3))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def nnet_mfu():
    """AM forward: 440 → 1024 ×3 → 3448, f32 HIGHEST (nn/layers.py)."""
    dims = [(440, 1024), (1024, 1024), (1024, 1024), (1024, 3448)]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B * T, 440), dtype=np.float32))
    ws = [jnp.asarray(rng.standard_normal(d, dtype=np.float32) * 0.02)
          for d in dims]

    @jax.jit
    def stack(x, ws):
        h = x
        for w in ws:
            h = jnp.maximum(
                jnp.dot(h, w, precision=jax.lax.Precision.HIGHEST), 0.0)
            if h.shape[-1] == 1024:
                h = h * jax.lax.rsqrt(jnp.mean(h * h, -1, keepdims=True)
                                      + 1e-9)
        return jnp.sum(h)        # scalar: timed() fetches it to sync

    dt = timed(stack, x, ws)
    flops = 2 * B * T * sum(a * b for a, b in dims)
    rate = flops / dt
    print(f"[NNET]  {flops / 1e9:.1f} GFLOP in {dt * 1e3:.1f} ms = "
          f"{rate / 1e12:.2f} TFLOP/s  "
          f"MFU {rate / PEAK_F32:.1%} of f32 ceiling "
          f"({rate / PEAK_BF16:.1%} of bf16 peak)")
    return dt


def sort_throughput(kp, mult, ops):
    n = kp * mult
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32)),
            jnp.asarray(rng.random(n, dtype=np.float32))]
    for _ in range(ops - 2):
        args.append(jnp.asarray(rng.integers(0, 1 << 30, n,
                                             dtype=np.int32)))
    f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2,
                                        is_stable=True)[1].sum())
    dt = timed(f, *args)
    byte_pass = n * ops * 4 * 2          # one read+write of every operand
    passes = dt * HBM_GBS * 1e9 / byte_pass
    print(f"[sort]  n={mult}·{kp//1024}k ops={ops}: {dt * 1e3:7.2f} ms = "
          f"{byte_pass / dt / 1e9:6.1f} GB/s single-pass-equiv "
          f"(= {passes:5.1f} HBM-rate passes; log2(n)={np.log2(n):.1f})")
    return dt


def decode_roofline(schedule_ms_per_frame):
    """schedule_ms_per_frame: {rung_kp: measured ms/frame} from
    profile_pooled phase output; computes achieved vs minimum traffic."""
    print("\n[decode roofline]  minimum single-touch traffic per frame "
          "vs measured:")
    arcs = 10                    # candidate lanes per token (block width)
    for kp, ms in schedule_ms_per_frame.items():
        n = kp * arcs
        # expansion rows (200 B each: 5 planes × 10 lanes × int32) + sortA
        # (3 ops) r/w + sortB (4 ops) r/w + placement gathers (3-wide rows)
        # + scoring read (pdf/weight) / write (cost) + one-hot factor
        traffic = (kp * 200          # arc-block rows
                   + n * 3 * 4 * 2  # sort A operands, one read+write
                   + n * 4 * 4 * 2  # sort B
                   + kp * 12 * 2    # placement gather
                   + n * 12)        # scoring in/out
        floor_ms = traffic / (HBM_GBS * 1e9) * 1e3
        print(f"  rung {kp:>7}: measured {ms:6.2f} ms/frame, single-touch "
              f"floor {floor_ms:5.2f} ms → achieved "
              f"{floor_ms / ms:6.1%} of HBM roofline")


def main():
    print(f"backend={jax.default_backend()}")
    nnet_mfu()
    for kp in (16384, 131072):
        for ops in (3, 4):
            sort_throughput(kp, 16, ops)
    # measured ms/frame per rung: pass as "kp=ms,kp=ms" or use defaults
    # recorded from scripts/profile_pooled.py (docs/PERFORMANCE.md r4)
    arg = sys.argv[1] if len(sys.argv) > 1 else ""
    sched = {}
    for part in arg.split(","):
        if "=" in part:
            k, v = part.split("=")
            sched[int(k)] = float(v)
    if sched:
        decode_roofline(sched)


if __name__ == "__main__":
    main()
