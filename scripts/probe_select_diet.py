"""Burst-crest select cost across hard-cap sizes (and, historically, the
select_beam operand-diet A/B).

Times decode_chunk_k (the burst crest program: B lanes, K-wide synthetic
FULL beams, folded bench graph) across candidate hard-cap sizes — the r5
cap escalation moved the crest 20480 → the hard cap, putting the crest
sort length on trial.

Measured r5 (per crest frame, B=32, payload-riding select):
  k=20480: 53.6 ms   k=30720: 95.2 ms   k=32768: 101.0 ms
and the index-recovery diet variant (PKTPU_SELECT_DIET=1, since REMOVED —
see the negative-result note in decoder/beam.py) lost at every shape:
  58.6 / 112.8 / 119.8 ms.

Usage: python scripts/probe_select_diet.py            # full matrix
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KS = (20480, 30720, 32768)
FRAMES = 6
B = 32


def run_once(k: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jaxcache"))
    import bench as benchmod
    from pocketkaldi_tpu import Recognizer
    from pocketkaldi_tpu.decoder import beam as blib
    from pocketkaldi_tpu.hparams import DecoderOptions

    conf = benchmod.ensure_model()
    rec = Recognizer.load(conf)
    g = blib.GraphArrays.build(rec.fst, rec.am.tid2pdf, fold_eps=True)
    opts = DecoderOptions(max_active=k, expand_factor=8, chunk_frames=64)
    rng = np.random.default_rng(0)
    scores = jnp.asarray(
        rng.standard_normal((B, FRAMES, 3448), dtype=np.float32) * 4.0)
    valid = jnp.ones((B, FRAMES), bool)
    # synthetic FULL crest beam (every slot live, cost-ascending — the
    # frame-step invariant); skips the minutes of CPU init_beam work the
    # real driver amortizes across a whole decode
    ns = int(np.asarray(g.final).shape[0])
    states = rng.integers(0, ns, size=(B, k)).astype(np.int32)
    costs = np.sort(rng.standard_normal((B, k)).astype(np.float32) * 2.0,
                    axis=-1)
    beam = blib.Beam(jnp.asarray(states), jnp.asarray(costs))

    def f():
        b2, recs, ovs, full, occ = blib.decode_chunk_k(
            beam, scores, valid, g, opts, 0, k)
        return occ

    float(f())                            # compile
    def chain(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = f()
        float(r)
        return time.perf_counter() - t0

    n1, n2 = 2, 8
    t1 = min(chain(n1) for _ in range(3))
    t2 = min(chain(n2) for _ in range(3))
    dt = max((t2 - t1) / (n2 - n1), 1e-9)
    diet = os.environ.get("PKTPU_SELECT_DIET", "0")
    print(f"RESULT k={k} diet={diet} chunk_s={dt:.4f} "
          f"per_frame_ms={dt / FRAMES * 1e3:.2f}", flush=True)


def main():
    if "--once" in sys.argv:
        run_once(int(sys.argv[sys.argv.index("--once") + 1]))
        return
    for diet in ("0", "1"):
        for k in KS:
            env = dict(os.environ, PKTPU_SELECT_DIET=diet)
            env.pop("XLA_FLAGS", None)
            env.pop("LIBTPU_INIT_ARGS", None)
            subprocess.run([sys.executable, "-u", os.path.abspath(__file__),
                            "--once", str(k)], env=env, check=False,
                           timeout=3000)


if __name__ == "__main__":
    main()
