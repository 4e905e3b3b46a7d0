"""Per-frame beam-demand probe: how many tokens are genuinely in-beam?

Decodes the bench wavs at a large K and records, per frame, the number of
finite beam slots after select.  This is the capacity the graph+AM actually
demand under beam pruning — the driver for choosing the bench parity K and
for any two-pass (small-K + escalate-on-overflow) scheme.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pocketkaldi_tpu.decoder import beam as B
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.recognizer import Recognizer
from pocketkaldi_tpu.io import wav as wavio


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    nwavs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    conf = os.path.join(CACHE, "benchmodel-p16-ws1-we0.3", "model.conf")
    wavs = [os.path.join(CACHE, "benchwavs-seg1", f"utt{i:03d}.wav")
            for i in range(nwavs)]
    waves = [wavio.read_16k_pcm(p) for p in wavs]

    rec = Recognizer.load(conf)
    opts = DecoderOptions(max_active=k, expand_factor=8, chunk_frames=64)
    g = B.GraphArrays.build(rec.fst, rec.am.tid2pdf, fold_eps=opts.fold_eps)

    from pocketkaldi_tpu.features.fbank import compute_fbank
    from pocketkaldi_tpu.features.cmvn import apply_cmvn
    b = len(waves)
    lengths = [int(np.shape(w)[-1]) for w in waves]
    num_frames = [rec.fbank_opts.num_frames(n) for n in lengths]
    pad_to = max(lengths)
    batch = np.zeros((b, pad_to), dtype=np.float32)
    for i, w in enumerate(waves):
        batch[i, :lengths[i]] = w
    feats = compute_fbank(jnp.asarray(batch),
                          rec.fbank_opts.num_frames(pad_to), rec.fbank_opts)
    feats = apply_cmvn(feats, rec.cmvn_stats, rec.cmvn_opts)
    scores = rec.am.compute(feats, acoustic_scale=opts.acoustic_scale,
                            num_frames=jnp.asarray(num_frames, jnp.int32))
    n_eps = 0 if g.folded else max(1, g.eps_depth)
    beam0, _ = B.init_beam_host(b, g, opts, max(1, g.closure_sweeps + 1)
                                if g.folded else n_eps)

    @jax.jit
    def occupancy(bm, sc, valid):
        def body(bm, xs):
            s_t, v_t = xs
            b2, _rec, _ov = B.frame_step(bm, s_t, v_t, g, opts, n_eps)
            return b2, jnp.sum(b2.state >= 0, axis=-1)
        _, occ = jax.lax.scan(
            body, bm, (jnp.swapaxes(sc, 0, 1), jnp.swapaxes(valid, 0, 1)))
        return occ    # (T, B)

    t = scores.shape[1]
    valid = jnp.arange(t)[None, :] < jnp.asarray(num_frames)[:, None]
    occ = np.asarray(occupancy(beam0, scores, valid))   # (T, B)
    occ = occ.T                                          # (B, T)
    for i in range(b):
        o = occ[i, :int(num_frames[i])]
        print(f"utt{i:03d}: max={o.max():6d} p99={int(np.percentile(o,99)):6d}"
              f" p90={int(np.percentile(o,90)):6d} median={int(np.median(o)):6d}"
              f" frames>{k//2}={int((o > k//2).sum())}"
              f" frames>{k//4}={int((o > k//4).sum())}")
    allo = np.concatenate([occ[i, :int(num_frames[i])] for i in range(b)])
    print(f"ALL: max={allo.max()} p99={int(np.percentile(allo,99))} "
          f"p90={int(np.percentile(allo,90))} median={int(np.median(allo))}")
    # Pool-demand view: the pooled decoder's per-frame demand is the SUM of
    # per-lane in-beam counts (GROUP-rounded) — print its time profile so
    # the pool schedule (per-chunk sizes) can be designed from data.
    out = os.path.join(CACHE, f"occupancy-k{k}-b{b}.npy")
    np.save(out, occ)
    print(f"saved (B, T) occupancy matrix to {out}")
    demand = (-(-occ // 128) * 128).sum(axis=0)          # (T,)
    for lo in range(0, occ.shape[1], 64):
        seg = demand[lo:lo + 64]
        print(f"frames {lo:3d}-{lo + len(seg) - 1:3d}: pool demand "
              f"max={int(seg.max()):7d} mean={int(seg.mean()):7d}")


if __name__ == "__main__":
    main()
