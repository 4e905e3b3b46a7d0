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

# K=20480 is the measured exact-parity capacity on this pack at the round-4
# 32-wav subset (BASELINE.md parity ladder: K=16384 gave 31/32 — utt015
# needs the extra headroom — and 20480 measures FASTER than 16384 too).
MAX_ACTIVE = int(os.environ.get("PKTPU_BENCH_K", "20480"))
WAV_POOL = 128           # wavs generated (rungs use prefixes of this list)
SECONDS = 5.0
# Reference decodes this many of the same wavs (VERDICT r3 next #7: widened
# 8 → 32; the reference run is cached after one CPU pass, so the wider
# subset costs one-time CPU minutes, not bench budget).
REF_SUBSET = int(os.environ.get("PKTPU_BENCH_REF_SUBSET", "32"))
SAMPLE_RATE = 16000
# 780 s: the four rungs take ~520 s WARM on the seeding host (most of it
# per-Recognizer tunnel load/warmup, not decode); 480 cut the seed-1 rung
# 71 s short.  The watchdog still guarantees termination and each rung
# emits a complete result line as it lands.
BUDGET_S = float(os.environ.get("PKTPU_BENCH_BUDGET_S", "780"))

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


def measure_reference(conf_path, wav_paths, seed: int = 0):
    """Wall-time the reference binary on a subset; cache the result."""
    ref_path = ref_result_path(seed)
    if os.path.exists(ref_path):
        with open(ref_path) as fd:
            cached = json.load(fd)
        if len(cached.get("hyps", {})) >= min(REF_SUBSET, len(wav_paths)):
            return cached
    from pocketkaldi_tpu.tools.reference_build import build_reference
    binary = build_reference()
    if binary is None:
        return None
    subset = wav_paths[:REF_SUBSET]
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
    result = {
        "audio_seconds": SECONDS * len(subset),
        "decode_seconds": decode_time,
        "rate": SECONDS * len(subset) / decode_time,
        "hyps": hyps,
        "lls": lls,
    }
    os.makedirs(CACHE, exist_ok=True)
    with open(ref_result_path(seed), "w") as fd:
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
    log(f"rung {record.get('rung')}: {record['value']} audio-s/s "
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
    # settle pass: a pooled decoder's learned schedule may introduce
    # smaller pool rungs that compile fresh on the SECOND decode of a
    # shape — keep that out of the timed loop
    t0 = time.perf_counter()
    utts = rec.process_batch(waves)
    log(f"rung {name}: settle {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(runs):
        utts = rec.process_batch(waves)
    elapsed = (time.perf_counter() - t0) / runs
    audio_seconds = batch * SECONDS
    rate = audio_seconds / elapsed

    exact = better = worse = 0
    vs_baseline = None
    parity = "n/a"
    if ref and ref["rate"] > 0:
        vs_baseline = rate / ref["rate"]
        exact, better, worse = parity_vs_reference(ref, wav_paths, utts)
        parity = f"{exact + better}/{len(ref['hyps'])}"

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
        max_active=MAX_ACTIVE, expand_factor=8, chunk_frames=64,
        pooled=True)

    rec = Recognizer.load(conf_path)

    # Rung A: per-lane decoder at a small K — the cheapest end-to-end
    # compile; honest-but-partial parity (r2 ladder: 6/8 at K=1024).
    rec.set_decoder_opts(DecoderOptions(
        max_active=1024, expand_factor=8, chunk_frames=64))
    run_rung("perlane-k1024", rec, waves[:32], wav_paths, ref, runs=2,
             extra={"max_active": 1024, "pooled": False,
                    "cache_env": env_fp})

    # Rung B: the headline — pooled decoder at the exact-parity capacity.
    rec.set_decoder_opts(pooled_opts)
    run_rung("pooled-parity", rec, waves[:32], wav_paths, ref, runs=2,
             extra={"max_active": MAX_ACTIVE, "pooled": True,
                    "cache_env": env_fp,
                    "pool_size": lambda: rec.decoder.last_pool_size,
                    "pool_growths":
                        lambda: rec.decoder.last_pool_growths,
                    "burst_retries":
                        lambda: rec.decoder.last_burst_retries})

    # Rung C: batch scaling at B=128 — gated on REMAINING BUDGET, not on a
    # warm-cache heuristic (VERDICT r3 next #3: the warmup_s<90 gate never
    # fired anywhere; a cold compile can't hang the bench — the watchdog
    # kills the worker group and keeps completed rungs).
    if remaining() > 90:
        rec2 = Recognizer.load(conf_path)
        rec2.set_decoder_opts(pooled_opts)
        run_rung("pooled-b128", rec2, waves, wav_paths, ref, runs=1,
                 extra={"max_active": MAX_ACTIVE, "pooled": True,
                        "cache_env": env_fp,
                        "pool_size": lambda: rec2.decoder.last_pool_size,
                        "pool_growths":
                            lambda: rec2.decoder.last_pool_growths})
    else:
        log(f"skipping rung pooled-b128 ({remaining():.0f}s budget left)")

    # Rung D: second pack seed — parity generalization (VERDICT r3 next
    # #7).  Fresh graph shapes → fresh compiles; cheapest last.
    if remaining() > 90:
        conf1 = ensure_model(seed=1)
        ref1 = measure_reference(conf1, wav_paths, seed=1)
        rec3 = Recognizer.load(conf1)
        rec3.set_decoder_opts(pooled_opts)
        run_rung("pooled-parity-seed1", rec3, waves[:32], wav_paths, ref1,
                 runs=1,
                 extra={"max_active": MAX_ACTIVE, "pooled": True,
                        "pack_seed": 1, "cache_env": env_fp,
                        "pool_size": lambda: rec3.decoder.last_pool_size})
    else:
        log(f"skipping rung pooled-parity-seed1 "
            f"({remaining():.0f}s budget left)")


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
                     if r.get("rung") != "pooled-parity-seed1"]
        best = max(main_pack or results, key=_score)
        if expired:
            best["budget_expired"] = True
        best["rungs_completed"] = [r.get("rung") for r in results]
        for r in results:
            if r.get("rung") == "pooled-parity-seed1":
                best["seed1_parity"] = r.get("transcript_parity")
                best["seed1_parity_exact"] = r.get("parity_exact")
                best["seed1_value"] = r.get("value")
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
