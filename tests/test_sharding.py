"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Gates (SURVEY.md §7 M5): the sharded pipeline compiles and executes over a
(data, model) mesh, transcripts identical to the unsharded path.
"""

import numpy as np
import pytest

import jax

from pocketkaldi_tpu import Recognizer
from pocketkaldi_tpu.config import Configuration
from pocketkaldi_tpu.decoder.beam import GraphArrays
from pocketkaldi_tpu.decoder.decoder import _traceback
from pocketkaldi_tpu.fst import Fst
from pocketkaldi_tpu.hparams import DecoderOptions
from pocketkaldi_tpu.io import binary
from pocketkaldi_tpu.parallel import ShardedPipeline, make_mesh
from pocketkaldi_tpu.tools.make_fixtures import write_fixture_model


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    m = write_fixture_model(str(d), seed=13)
    return d, m


def build_pipeline(m, mesh, opts=None):
    conf = Configuration.read(m.conf_path)
    rec = Recognizer.load(m.conf_path)
    fst = Fst.read(conf.get_path("fst"))
    graph = GraphArrays.build(fst, rec.am.tid2pdf)
    opts = opts or DecoderOptions(max_active=64, expand_factor=8)
    return ShardedPipeline(
        mesh, graph, rec.am.nnet.kinds, rec.am.nnet.params,
        rec.am.log_prior, rec.cmvn_stats, rec.am.left_context,
        rec.am.right_context, decoder_opts=opts,
        num_eps_iters=rec.decoder.num_eps_iters), rec


def synth_batch(rng, b, n):
    return (rng.randn(b, n) * 5000).astype(np.float32)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == jax.device_count()
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape["model"] == 2


def test_sharded_pipeline_matches_host_path(model_dir):
    d, m = model_dir
    assert jax.device_count() == 8
    mesh = make_mesh(model_parallel=2)  # 4-way data, 2-way tensor
    opts = DecoderOptions(max_active=64, expand_factor=8)
    pipe, rec = build_pipeline(m, mesh, opts)
    rec.decoder_opts = opts
    rec.decoder = type(rec.decoder)(rec.fst, rec.am.tid2pdf, opts)

    rng = np.random.RandomState(30)
    b, n = 8, 8000
    waves = synth_batch(rng, b, n)
    lengths = np.full(b, n, dtype=np.int32)

    recs, init_rec, beam, (slot, total, fin) = pipe.step(waves, lengths)
    slot = np.asarray(slot)
    prev = np.asarray(recs.prev)   # (T, B, 1+G, K) — scan stacks on axis 0
    word = np.asarray(recs.word)
    init_prev = np.asarray(init_rec.prev)
    init_word = np.asarray(init_rec.word)

    # Reference path: per-utterance host pipeline
    expected = rec.process_batch([waves[i] for i in range(b)])

    t = prev.shape[0]
    for i in range(b):
        if slot[i] < 0:
            assert expected[i].hyp == ""
            continue
        words = _traceback(int(slot[i]), prev[:, i], word[:, i],
                           init_prev[i], init_word[i], t)
        text = " ".join(rec.symbols.get(w) for w in words)
        assert text == expected[i].hyp, f"utt {i}: '{text}' vs '{expected[i].hyp}'"


def test_data_only_mesh(model_dir):
    d, m = model_dir
    mesh = make_mesh()  # 8-way data
    pipe, rec = build_pipeline(m, mesh)
    rng = np.random.RandomState(31)
    waves = synth_batch(rng, 8, 6400)
    lengths = np.full(8, 6400, dtype=np.int32)
    recs, init_rec, beam, (slot, total, fin) = pipe.step(waves, lengths)
    assert np.asarray(slot).shape == (8,)
    assert np.isfinite(np.asarray(total)).any()
