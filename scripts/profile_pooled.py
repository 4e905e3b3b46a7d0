"""Pooled-decoder throughput probe at bench scale, on the real backend.

Decodes the bench wavs end-to-end with PooledViterbiDecoder at the
exact-parity capacity (K=16384) and various pool sizes / batch sizes;
prints per-config audio-s/s plus pool growth events.  Faster signal than
the full bench for kernel iteration.

Usage: python scripts/profile_pooled.py [batch] [max_active] [pool_size]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

import numpy as np
import jax

os.environ.setdefault(
    "PKTPU_POOL_SCHEDULES",
    os.path.join(REPO, ".cache", "pool_schedules.json"))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.recognizer import Recognizer
from pocketkaldi_tpu.io import wav as wavio


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    pool_size = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    conf = os.path.join(CACHE, "benchmodel-p16-ws1-we0.3", "model.conf")
    wavs = [os.path.join(CACHE, "benchwavs-seg1", f"utt{i:03d}.wav")
            for i in range(batch)]
    waves = [wavio.read_16k_pcm(p) for p in wavs]

    rec = Recognizer.load(conf)
    cap = int(os.environ.get("PKTPU_PROFILE_KCAP", "0"))
    rec.set_decoder_opts(DecoderOptions(
        max_active=k, expand_factor=8, chunk_frames=chunk, pooled=True,
        max_active_cap=cap or None, pool_size=pool_size or None))
    print(f"backend={jax.default_backend()} B={batch} K={k} "
          f"pool_size={pool_size or 'auto'}", file=sys.stderr)

    t0 = time.perf_counter()
    utts = rec.process_batch(waves)
    t_compile = time.perf_counter() - t0
    print(f"warmup (incl. compile): {t_compile:.1f}s "
          f"pool={rec.decoder.last_pool_size} "
          f"growths={rec.decoder.last_pool_growths}", file=sys.stderr)
    # settle pass: the learned schedule may introduce smaller rungs that
    # compile fresh on the SECOND decode of a shape — keep that out of the
    # timed section
    t0 = time.perf_counter()
    utts = rec.process_batch(waves)
    print(f"settle: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    runs = 3
    rec.timers.reset()
    if os.environ.get("PKTPU_POOL_PHASES"):
        from pocketkaldi_tpu.utils.timing import StageTimers
        rec.decoder.phase_timers = StageTimers()
    t0 = time.perf_counter()
    for _ in range(runs):
        utts = rec.process_batch(waves)
    dt = (time.perf_counter() - t0) / runs
    audio = batch * 5.0
    print(f"{audio / dt:.1f} audio-s/s  (batch_wall={dt:.2f}s, "
          f"pool={rec.decoder.last_pool_size}, "
          f"growths={rec.decoder.last_pool_growths})")
    print("stage totals over timed runs:\n" + rec.timers.report())
    if rec.decoder.phase_timers is not None:
        print("decode phase totals (device-synced):\n"
              + rec.decoder.phase_timers.report())
    dem = getattr(rec.decoder, "last_demand", None)
    if dem is not None:
        print("per-slot pool demand:", list(map(int, dem)))
    learned = getattr(rec.decoder, "_learned", None)
    if learned:
        for key, sched in learned.items():
            print(f"learned schedule {key}: {sched}")
    for u in utts[:3]:
        print(f"  {u.hyp[:60]!r} ll={u.loglikelihood_per_frame:.4f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
