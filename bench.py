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
BENCH_MODEL_DIR = os.path.join(CACHE, "benchmodel")
BENCH_WAV_DIR = os.path.join(CACHE, "benchwavs")
REF_RESULT = os.path.join(CACHE, "bench_reference.json")

BATCH = 32
SECONDS = 5.0
REF_SUBSET = 2           # reference decodes this many of the same wavs
SAMPLE_RATE = 16000


def ensure_model():
    from pocketkaldi_tpu.tools.make_fixtures import write_bench_model
    conf = os.path.join(BENCH_MODEL_DIR, "model.conf")
    if not os.path.exists(conf):
        write_bench_model(BENCH_MODEL_DIR, seed=0)
    return conf


def ensure_wavs():
    from pocketkaldi_tpu.io import wav as wavio
    os.makedirs(BENCH_WAV_DIR, exist_ok=True)
    rng = np.random.RandomState(7)
    n = int(SAMPLE_RATE * SECONDS)
    t = np.arange(n) / SAMPLE_RATE
    paths = []
    for i in range(BATCH):
        p = os.path.join(BENCH_WAV_DIR, f"utt{i:03d}.wav")
        if not os.path.exists(p):
            f0 = rng.uniform(150, 700)
            f1 = rng.uniform(800, 2500)
            tone = (np.sin(2 * np.pi * f0 * t) +
                    0.4 * np.sin(2 * np.pi * f1 * t) +
                    0.2 * np.sin(2 * np.pi * 3.1 * t))
            w = ((tone + rng.randn(n) * 0.15) * 7000).astype(np.float32)
            wavio.write_16k_pcm(p, w)
        else:
            rng.uniform(size=4)  # keep the stream aligned
            rng.randn(n)
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
    for line in out.stdout.strip().splitlines():
        parts = line.split("\t")
        if len(parts) == 3:
            hyps[parts[0]] = parts[1]
    decode_time = max(t_full - t_load, 1e-6)
    result = {
        "audio_seconds": SECONDS * len(subset),
        "decode_seconds": decode_time,
        "rate": SECONDS * len(subset) / decode_time,
        "hyps": hyps,
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
    # K=6144 exact top-K: the smallest capacity with full transcript parity
    # vs the reference's 30k sampled cutoff on this pack (the random-weight
    # bench model is near-degenerate, so the in-beam state count is huge; a
    # real ASR model needs far less).  K=2048 runs ~3x faster if parity is
    # not required.
    rec.decoder_opts = DecoderOptions(max_active=6144, expand_factor=8,
                                      chunk_frames=64)
    rec.decoder = type(rec.decoder)(rec.fst, rec.am.tid2pdf,
                                    rec.decoder_opts)

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

    ref = measure_reference(conf_path, wav_paths)
    if ref and ref["rate"] > 0:
        vs_baseline = rate / ref["rate"]
        agree = sum(
            1 for p, u in zip(wav_paths, utts)
            if p in ref["hyps"] and ref["hyps"][p] == u.hyp)
        parity = f"{agree}/{len(ref['hyps'])}"
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
    }
    with open(LAST_GOOD, "w") as fd:
        json.dump(result, fd)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
