"""Benchmark: end-to-end batched decode throughput on the current backend.

Prints ONE JSON line:
    {"metric": "audio_seconds_per_second", "value": N, "unit": "audio-s/s",
     "vs_baseline": R, ...}

The metric is audio-seconds decoded per wall-second for the FULL pipeline
(WAV bytes → transcripts, including host traceback) on a bench-scale model
pack (1024-wide nnet2-style AM, 100k-state synthetic HCLG — see
tools/make_fixtures.write_bench_model).

``vs_baseline`` is measured, not assumed: the reference C++ binary
(pcannon67/pocketkaldi, compiled from /root/reference by
tools/reference_build.py) decodes a subset of the same WAVs with the same
model pack on this host's CPU; the ratio is ours/theirs.  The reference
publishes no numbers of its own (BASELINE.md), so self-measurement on shared
inputs is the baseline protocol.  Transcript agreement between the two
systems is also checked and reported.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

# Structured (realistic) pack: peaked AM posteriors, long-tailed graph
# weights, words on emitting arcs (see tools/make_fixtures.write_bench_model).
# The round-1 pack used all-zero knobs — unit-scale random weights make the
# posteriors near-uniform, which is maximally adversarial for beam pruning
# (parity needed K=6144); a structured pack is representative of speech and
# reaches reference parity at much smaller K.  Override via PKTPU_BENCH_*.
PACK = {
    "peakiness": float(os.environ.get("PKTPU_BENCH_PEAKINESS", "16.0")),
    "weight_spread": float(os.environ.get("PKTPU_BENCH_WSPREAD", "1.0")),
    "word_on_emit": float(os.environ.get("PKTPU_BENCH_WEMIT", "0.3")),
}
PACK_TAG = "p{peakiness:g}-ws{weight_spread:g}-we{word_on_emit:g}".format(
    **PACK)
BENCH_MODEL_DIR = os.path.join(CACHE, f"benchmodel-{PACK_TAG}")
# Wav generator version rides the dir/cache names: the reference's cached
# transcripts are only valid for the exact wav bytes it decoded.
WAV_TAG = "seg1"
BENCH_WAV_DIR = os.path.join(CACHE, f"benchwavs-{WAV_TAG}")
REF_RESULT = os.path.join(CACHE,
                          f"bench_reference-{PACK_TAG}-{WAV_TAG}.json")

BATCH = int(os.environ.get("PKTPU_BENCH_BATCH", "128"))
# K=16384 is the measured exact-parity capacity on this pack (BASELINE.md
# parity ladder: 8/8 bit-exact transcripts + costs vs the reference binary).
# The pooled decoder makes this capacity affordable: the shared token pool
# prices each frame at actual occupancy (median ~243/lane) instead of
# B×K worst case.
MAX_ACTIVE = int(os.environ.get("PKTPU_BENCH_K", "16384"))
POOLED = os.environ.get("PKTPU_BENCH_POOLED", "1") != "0"
SECONDS = 5.0
REF_SUBSET = 8           # reference decodes this many of the same wavs
SAMPLE_RATE = 16000


def ensure_model():
    from pocketkaldi_tpu.tools.make_fixtures import write_bench_model
    conf = os.path.join(BENCH_MODEL_DIR, "model.conf")
    if not os.path.exists(conf):
        write_bench_model(BENCH_MODEL_DIR, seed=0, **PACK)
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
    for i in range(BATCH):
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


def measure_reference(conf_path, wav_paths):
    """Wall-time the reference binary on a subset; cache the result."""
    if os.path.exists(REF_RESULT):
        with open(REF_RESULT) as fd:
            return json.load(fd)
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
    with open(REF_RESULT, "w") as fd:
        json.dump(result, fd)
    return result


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


LAST_GOOD = os.path.join(CACHE, "last_bench.json")


def preflight(timeout_s: float = 600.0) -> bool:
    """Verify the device answers a trivial program within the budget.

    The tunneled TPU in this environment can wedge for long stretches; a
    hung bench records nothing, so on preflight failure we emit the last
    known-good result marked stale (or an explicit error record).
    """
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


def main():
    import jax
    # Persistent compile cache: the decode program is large; reuse across runs.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if not preflight():
        if os.path.exists(LAST_GOOD):
            with open(LAST_GOOD) as fd:
                result = json.load(fd)
            result["stale"] = True
            result["note"] = "device preflight failed; last good result"
            print(json.dumps(result))
        else:
            print(json.dumps({
                "metric": "audio_seconds_per_second", "value": 0.0,
                "unit": "audio-s/s", "vs_baseline": None,
                "error": "device preflight failed"}))
        return

    from pocketkaldi_tpu import Recognizer
    from pocketkaldi_tpu.hparams import DecoderOptions
    from pocketkaldi_tpu.io import wav as wavio

    log("generating model pack...")
    conf_path = ensure_model()
    log("generating wavs...")
    wav_paths = ensure_wavs()
    waves = [wavio.read_16k_pcm(p) for p in wav_paths]

    log(f"loading model on backend={jax.default_backend()}...")
    rec = Recognizer.load(conf_path)
    # Exact top-K capacity at the measured parity point (K=16384, 8/8 exact
    # vs the reference binary — BASELINE.md); the pooled decoder prices that
    # capacity at occupancy so it stays fast.  transcript_parity re-verifies
    # on every run below.
    rec.set_decoder_opts(DecoderOptions(max_active=MAX_ACTIVE,
                                        expand_factor=8, chunk_frames=64,
                                        pooled=POOLED))

    # Warm-up: compile every shape bucket once.
    log("warmup/compile...")
    rec.process_batch(waves)
    rec.timers.reset()
    log("timed runs...")

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        utts = rec.process_batch(waves)
    elapsed = (time.perf_counter() - t0) / runs
    audio_seconds = BATCH * SECONDS
    rate = audio_seconds / elapsed

    # One profiler trace per bench run (BASELINE.md protocol): best-effort —
    # a wedged profiler must not kill the measurement.
    if os.environ.get("PKTPU_BENCH_TRACE", "1") != "0":
        try:
            trace_dir = os.path.join(CACHE, "profile")
            log(f"capturing jax.profiler trace to {trace_dir}...")
            with jax.profiler.trace(trace_dir):
                rec.process_batch(waves)
        except Exception as e:      # pragma: no cover
            log(f"profiler trace failed (non-fatal): {e}")

    ref = measure_reference(conf_path, wav_paths)
    exact = better = worse = 0
    if ref and ref["rate"] > 0:
        vs_baseline = rate / ref["rate"]
        # Parity protocol: exact transcript match, OR our 1-best has strictly
        # LOWER total path cost per frame.  NOTE the reference's printed
        # "loglikelihood_per_frame" is hyp.weight()/ncol (pocketkaldi.cc:239)
        # where weight is Viterbi path COST (decoder.cc:336) — lower is
        # better; ours matches that formula for CLI parity.  A differing
        # transcript with HIGHER cost is a search error on our side (the
        # reference keeps up to 30k tokens; exact top-K below that prunes
        # more) and counts against parity.
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
        parity = f"{exact + better}/{len(ref['hyps'])}"
    else:
        vs_baseline = None
        parity = "n/a"

    result = {
        "metric": "audio_seconds_per_second",
        "value": round(rate, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "backend": jax.default_backend(),
        "batch": BATCH,
        "utt_seconds": SECONDS,
        "batch_wall_s": round(elapsed, 3),
        "reference_rate": round(ref["rate"], 3) if ref else None,
        "transcript_parity": parity,
        "parity_exact": exact,
        "parity_ours_better": better,
        "parity_mismatch": worse,
        "max_active": MAX_ACTIVE,
        "pooled": POOLED,
        "pool_size": getattr(rec.decoder, "last_pool_size", None),
        "pack": PACK_TAG,
    }
    with open(LAST_GOOD, "w") as fd:
        json.dump(result, fd)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
