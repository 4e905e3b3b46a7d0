"""End-to-end pipeline tests: WAV → fbank → CMVN → AM → decode → words.

The reference has no end-to-end test (SURVEY.md §4 gap); these use the
synthetic fixture model pack plus an end-to-end numpy oracle.
"""

import subprocess
import sys

import numpy as np
import pytest

from oracle import am_scores_np, viterbi_oracle
from pocketkaldi_tpu import Recognizer
from pocketkaldi_tpu.config import Configuration
from pocketkaldi_tpu.features.cmvn import apply_cmvn
from pocketkaldi_tpu.features.fbank import compute_fbank_np
from pocketkaldi_tpu.fst import Fst
from pocketkaldi_tpu.io import binary, wav
from pocketkaldi_tpu.tools.make_fixtures import write_fixture_model


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    m = write_fixture_model(str(d), seed=5)
    return d, m


def synth_wave(rng, seconds=0.5):
    n = int(16000 * seconds)
    t = np.arange(n) / 16000.0
    tone = (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1321 * t))
    noise = rng.randn(n) * 0.1
    return ((tone + noise) * 8000).astype(np.float32)


def test_end_to_end_matches_oracle(model_dir):
    d, m = model_dir
    rng = np.random.RandomState(20)
    wave = synth_wave(rng)

    rec = Recognizer.load(m.conf_path)
    utt = rec.process_batch([wave])[0]

    # Oracle: full pipeline in numpy/float64
    conf = Configuration.read(m.conf_path)
    feats = compute_fbank_np(wave)
    stats = binary.read_vector_file(conf.get_path("cmvn_stats"))
    feats_n = np.asarray(apply_cmvn(feats, stats))
    spec = binary.read_nnet_file(conf.get_path("nnet"))
    prior = binary.read_vector_file(conf.get_path("prior"))
    scores = am_scores_np(feats_n, spec, prior, m.left_context,
                          m.right_context, 0.1).astype(np.float32)
    fst = Fst.read(conf.get_path("fst"))
    tid2pdf = binary.read_vector_file(conf.get_path("tid2pdf"), dtype=np.int32)
    want_words, want_cost = viterbi_oracle(fst, tid2pdf, scores)

    want_text = " ".join(m.words[w] for w in want_words)
    assert utt.hyp == want_text
    assert utt.num_frames == feats.shape[0]


def test_batch_of_three(model_dir):
    d, m = model_dir
    rng = np.random.RandomState(21)
    waves = [synth_wave(rng, s) for s in (0.4, 0.55, 0.7)]
    rec = Recognizer.load(m.conf_path)
    utts = rec.process_batch(waves)
    singles = [rec.process_batch([w])[0] for w in waves]
    for u, s in zip(utts, singles):
        assert u.hyp == s.hyp
        assert u.loglikelihood_per_frame == pytest.approx(
            s.loglikelihood_per_frame, rel=1e-5)


def test_config_hyperparameter_promotion(model_dir, tmp_path):
    d, m = model_dir
    text = open(m.conf_path).read()
    alt = tmp_path / "alt.conf"
    alt.write_text(text.replace("model.", str(d) + "/model.") +
                   "beam = 20.0\nmax_active = 128\nacoustic_scale = 0.08\n")
    rec = Recognizer.load(str(alt))
    assert rec.decoder_opts.beam == 20.0
    assert rec.decoder_opts.max_active == 128
    assert rec.decoder_opts.acoustic_scale == 0.08


def test_cli(model_dir, tmp_path):
    d, m = model_dir
    rng = np.random.RandomState(22)
    wav_path = str(tmp_path / "utt.wav")
    wav.write_16k_pcm(wav_path, synth_wave(rng))
    scp_path = str(tmp_path / "list.scp")
    with open(scp_path, "w") as fd:
        fd.write(wav_path + "\n")
    out = subprocess.run(
        [sys.executable, "-m", "pocketkaldi_tpu", m.conf_path, scp_path],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": ".",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    line = out.stdout.strip().splitlines()[-1]
    fields = line.split("\t")
    assert fields[0] == wav_path
    assert len(fields) == 3  # filename \t hyp \t loglike (main.cc:28)
    float(fields[2])


def test_empty_utterance(model_dir):
    d, m = model_dir
    rec = Recognizer.load(m.conf_path)
    utt = rec.process_batch([np.zeros(100, dtype=np.float32)])[0]
    assert utt.hyp == ""  # pocketkaldi.cc:180-185 empty-wave path
    assert utt.num_frames == 0


def test_lazy_scoring_matches_full(model_dir):
    """Chunked lazy AM scoring (long-audio path) equals full-matrix scoring."""
    d, m = model_dir
    rng = np.random.RandomState(23)
    wave = synth_wave(rng, 1.2)
    rec_full = Recognizer.load(m.conf_path)
    rec_lazy = Recognizer.load(m.conf_path)
    rec_lazy.lazy_scores_threshold = 1  # force the lazy path
    a = rec_full.process_batch([wave])[0]
    b = rec_lazy.process_batch([wave])[0]
    assert a.hyp == b.hyp
    assert a.loglikelihood_per_frame == pytest.approx(
        b.loglikelihood_per_frame, rel=1e-5)
