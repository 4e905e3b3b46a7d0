"""Differential integration tests against the compiled reference binary.

The strongest parity gate (SURVEY.md §7 M3): on shared synthetic model packs
(written in the reference's own binary formats) and shared WAVs, the 1-best
transcript and the printed per-frame log-likelihood must match the actual
C++ reference executable.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.full

from pocketkaldi_tpu import Recognizer
from pocketkaldi_tpu.io import wav
from pocketkaldi_tpu.tools.make_fixtures import write_fixture_model
from pocketkaldi_tpu.tools.reference_build import build_reference, run_reference


@pytest.fixture(scope="module")
def ref_binary():
    binary = build_reference()
    if binary is None:
        pytest.skip("reference source/toolchain unavailable")
    return binary


def synth_wave(rng, seconds):
    n = int(16000 * seconds)
    t = np.arange(n) / 16000.0
    f0, f1 = rng.uniform(200, 600), rng.uniform(900, 1800)
    tone = np.sin(2 * np.pi * f0 * t) + 0.5 * np.sin(2 * np.pi * f1 * t)
    return ((tone + rng.randn(n) * 0.1) * 8000).astype(np.float32)


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_transcript_parity(tmp_path, ref_binary, seed):
    m = write_fixture_model(str(tmp_path / "model"), seed=seed)
    rng = np.random.RandomState(100 + seed)
    wav_paths = []
    for i in range(3):
        p = str(tmp_path / f"utt{i}.wav")
        wav.write_16k_pcm(p, synth_wave(rng, rng.uniform(0.4, 1.0)))
        wav_paths.append(p)
    scp = str(tmp_path / "utts.scp")
    with open(scp, "w") as fd:
        fd.write("\n".join(wav_paths) + "\n")

    ref_rows = run_reference(ref_binary, m.conf_path, scp)
    assert len(ref_rows) == 3

    rec = Recognizer.load(m.conf_path)
    waves = [wav.read_16k_pcm(p) for p in wav_paths]
    utts = rec.process_batch(waves)

    for (fname, ref_hyp, ref_ll), utt, p in zip(ref_rows, utts, wav_paths):
        assert fname == p
        assert utt.hyp == ref_hyp, \
            f"{p}: ours '{utt.hyp}' vs reference '{ref_hyp}'"
        # printed with %f (6 decimals) by the reference (main.cc:28)
        assert utt.loglikelihood_per_frame == pytest.approx(ref_ll, abs=2e-4)

    # BASELINE.md protocol: corpus WER vs reference transcripts must be 0.
    from pocketkaldi_tpu.utils.wer import corpus_wer
    w = corpus_wer([r[1] for r in ref_rows], [u.hyp for u in utts])
    assert w.errors == 0 and w.wer == 0.0
