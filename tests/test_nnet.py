"""NN stack + acoustic model differential tests vs numpy oracle.

The reference has no nnet golden file (SURVEY.md §7 M2), so the executable
spec is a float64 numpy transcription of nnet.cc / am.cc semantics.
"""

import numpy as np
import pytest

from oracle import am_scores_np, nnet_forward_np, splice_np
from pocketkaldi_tpu.config import Configuration
from pocketkaldi_tpu.io import binary
from pocketkaldi_tpu.nn import AcousticModel, Nnet, splice_frames
from pocketkaldi_tpu.nn.am import am_scores
from pocketkaldi_tpu.tools.make_fixtures import make_nnet_spec, write_fixture_model


@pytest.fixture(scope="module")
def spec():
    return make_nnet_spec(np.random.RandomState(7), in_dim=30, hidden=24,
                          out_dim=16)


def test_nnet_matches_oracle(spec):
    rng = np.random.RandomState(8)
    x = rng.randn(12, 30).astype(np.float32)
    nnet = Nnet.from_spec(spec)
    got = np.asarray(nnet(x))
    want = nnet_forward_np(x, spec)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_all_layer_kinds():
    rng = np.random.RandomState(9)
    spec = binary.NnetSpec(layers=[
        binary.LayerSpec(kind=binary.LAYER_LINEAR,
                         weight=rng.randn(6, 5).astype(np.float32),
                         bias=rng.randn(6).astype(np.float32)),
        binary.LayerSpec(kind=binary.LAYER_MUL,
                         vec=rng.rand(6).astype(np.float32) + 0.5),
        binary.LayerSpec(kind=binary.LAYER_ADD, scale=0.25,
                         vec=rng.randn(6).astype(np.float32)),
        binary.LayerSpec(kind=binary.LAYER_RELU),
        binary.LayerSpec(kind=binary.LAYER_NORMALIZE),
        binary.LayerSpec(kind=binary.LAYER_SOFTMAX),
    ])
    x = rng.randn(4, 5).astype(np.float32)
    got = np.asarray(Nnet.from_spec(spec)(x))
    want = nnet_forward_np(x, spec)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # softmax rows sum to 1
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-6)


def test_splice_edge_replication():
    feats = np.arange(5 * 2, dtype=np.float32).reshape(5, 2)
    got = np.asarray(splice_frames(feats, 2, 1))
    want = splice_np(feats, 2, 1)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (5, 8)
    # first frame: left context replicates frame 0 (am.cc:74-76)
    np.testing.assert_array_equal(got[0, :2], feats[0])
    np.testing.assert_array_equal(got[0, 2:4], feats[0])
    # last frame: right context replicates the last frame
    np.testing.assert_array_equal(got[-1, -2:], feats[-1])


def test_am_scores_matches_oracle(spec):
    rng = np.random.RandomState(10)
    prior = rng.rand(16).astype(np.float32) + 0.05
    prior /= prior.sum()
    feats = rng.randn(9, 10).astype(np.float32)  # 30 = (1+1+1)*10
    log_prior = np.log(prior.astype(np.float64)).astype(np.float32)
    nnet = Nnet.from_spec(spec)
    got = np.asarray(am_scores(
        feats, nnet.kinds, nnet.params, log_prior, 1, 1,
        acoustic_scale=0.1))
    want = am_scores_np(feats, spec, prior, 1, 1, acoustic_scale=0.1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_acoustic_model_load_and_compute(tmp_path):
    m = write_fixture_model(str(tmp_path), seed=3)
    conf = Configuration.read(m.conf_path)
    am = AcousticModel.read(conf)
    assert am.num_pdfs == m.num_pdfs
    assert am.left_context == m.left_context
    assert am.tid2pdf.shape == (m.num_tids + 1,)
    rng = np.random.RandomState(11)
    feats = rng.randn(20, m.feat_dim).astype(np.float32)
    scores = np.asarray(am.compute(feats, acoustic_scale=0.1))
    assert scores.shape == (20, m.num_pdfs)
    assert np.isfinite(scores).all()

    spec = binary.read_nnet_file(conf.get_path("nnet"))
    prior = binary.read_vector_file(conf.get_path("prior"))
    want = am_scores_np(feats, spec, prior, am.left_context,
                        am.right_context, 0.1)
    np.testing.assert_allclose(scores, want, atol=1e-4)


def test_batched_am(spec):
    rng = np.random.RandomState(12)
    prior = rng.rand(16).astype(np.float32) + 0.05
    log_prior = np.log(prior.astype(np.float64)).astype(np.float32)
    feats = rng.randn(3, 7, 10).astype(np.float32)
    nnet = Nnet.from_spec(spec)
    batched = np.asarray(am_scores(feats, nnet.kinds, nnet.params,
                                   log_prior, 1, 1))
    for b in range(3):
        single = np.asarray(am_scores(feats[b], nnet.kinds, nnet.params,
                                      log_prior, 1, 1))
        np.testing.assert_allclose(batched[b], single, atol=1e-6)
