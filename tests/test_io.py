"""Binary section format + symbol table + WAV reader tests.

Mirrors the reference's fixture-driven tests (test/symbol_table_test.cc,
test/fst_test.cc) on the reference's own binary fixtures, plus round-trip
tests with our writers.
"""

import io
import os

import numpy as np
import pytest

from pocketkaldi_tpu.errors import CorruptionError
from pocketkaldi_tpu.fst import Fst
from pocketkaldi_tpu.io import binary, wav
from pocketkaldi_tpu.io.symbols import SymbolTable


def test_symbol_table_reference_fixture(reference_data_dir):
    # Fixture holds 4 packed words (test/symbol_table_test.cc:10-31).
    table = SymbolTable.read(os.path.join(reference_data_dir,
                                          "symboltable_test.bin"))
    assert len(table) == 4
    words = " ".join(table.get(i) for i in range(4))
    assert words == "hello world cat milk"


def test_symbol_table_roundtrip(tmp_path):
    words = ["<eps>", "hello", "world", "cat", "milk"]
    path = str(tmp_path / "sym.bin")
    SymbolTable(words).write(path)
    table = SymbolTable.read(path)
    assert list(table) == words


def test_vector_roundtrip():
    buf = io.BytesIO()
    vec = np.arange(41, dtype=np.float32) * 0.5
    binary.write_vector(buf, vec)
    buf.seek(0)
    out = binary.read_vector(binary.Reader(buf, "mem"))
    np.testing.assert_array_equal(out, vec)


def test_int_vector_roundtrip():
    buf = io.BytesIO()
    vec = np.arange(17, dtype=np.int32)
    binary.write_vector(buf, vec)
    buf.seek(0)
    out = binary.read_vector(binary.Reader(buf, "mem"), dtype=np.int32)
    np.testing.assert_array_equal(out, vec)


def test_cmvn_stats_fixture(reference_data_dir):
    # VEC0 of 41 floats: 40 sums + frame count (SURVEY.md §2.3)
    stats = binary.read_vector_file(
        os.path.join(reference_data_dir, "cmvn_stats.bin"))
    assert stats.shape == (41,)
    assert stats[40] > 0  # global frame count must be positive (cmvn.cc:85)


def test_matrix_roundtrip():
    buf = io.BytesIO()
    mat = np.random.RandomState(0).randn(5, 7).astype(np.float32)
    binary.write_matrix(buf, mat)
    buf.seek(0)
    out = binary.read_matrix(binary.Reader(buf, "mem"))
    np.testing.assert_array_equal(out, mat)


def test_nnet_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    spec = binary.NnetSpec(layers=[
        binary.LayerSpec(kind=binary.LAYER_LINEAR,
                         weight=rng.randn(8, 12).astype(np.float32),
                         bias=rng.randn(8).astype(np.float32)),
        binary.LayerSpec(kind=binary.LAYER_RELU),
        binary.LayerSpec(kind=binary.LAYER_NORMALIZE),
        binary.LayerSpec(kind=binary.LAYER_MUL,
                         vec=rng.rand(8).astype(np.float32)),
        binary.LayerSpec(kind=binary.LAYER_ADD, scale=0.5,
                         vec=rng.rand(8).astype(np.float32)),
        binary.LayerSpec(kind=binary.LAYER_SOFTMAX),
    ])
    path = str(tmp_path / "x.nnet")
    binary.write_nnet_file(path, spec)
    out = binary.read_nnet_file(path)
    kinds = [l.kind for l in out.layers]
    assert kinds == [0, 1, 2, 5, 4, 3]
    np.testing.assert_array_equal(out.layers[0].weight, spec.layers[0].weight)
    np.testing.assert_array_equal(out.layers[0].bias, spec.layers[0].bias)
    assert out.layers[4].scale == 0.5
    np.testing.assert_array_equal(out.layers[4].vec, spec.layers[4].vec)


def test_fst_reference_fixture(reference_data_dir):
    # Fixture graph asserted arc-by-arc in test/fst_test.cc:13-61.
    f = Fst.read(os.path.join(reference_data_dir, "testinput.fst"))
    assert f.start_state == 0
    arcs0 = list(f.arcs_of(0))
    assert (1, 1, 1, pytest.approx(0.5)) in arcs0
    # CSR row_ptr must cover every arc exactly once
    assert f.row_ptr[0] == 0
    assert f.row_ptr[-1] == f.num_arcs
    assert (f.out_degree >= 0).all()
    assert f.out_degree.sum() == f.num_arcs


def test_fst_roundtrip(tmp_path):
    f = Fst.from_arcs(
        num_states=4, start_state=0,
        arcs=[(0, 1, 1, 10, 0.5), (0, 2, 2, 0, 1.0), (1, 3, 0, 20, 0.25),
              (2, 3, 3, 0, 0.125)],
        finals={3: 0.0})
    path = str(tmp_path / "g.fst")
    f.write(path)
    g = Fst.read(path)
    assert g.num_states == 4 and g.num_arcs == 4
    np.testing.assert_array_equal(g.row_ptr, [0, 2, 3, 4, 4])
    np.testing.assert_array_equal(g.next_state, f.next_state)
    assert g.final_weight(3) == 0.0 and np.isinf(g.final_weight(1))
    assert g.eps_depth == 1  # 0->... arcs with ilabel 0: state 1->3


def test_fst_eps_views():
    f = Fst.from_arcs(
        num_states=3, start_state=0,
        arcs=[(0, 1, 0, 5, 0.1), (0, 1, 7, 0, 0.2), (1, 2, 0, 0, 0.3)],
        finals={2: 0.0})
    eps_ptr, eps_idx = f.eps_row_ptr_and_arcs
    emit_ptr, emit_idx = f.emit_row_ptr_and_arcs
    np.testing.assert_array_equal(eps_ptr, [0, 1, 2, 2])
    np.testing.assert_array_equal(eps_idx, [0, 2])
    np.testing.assert_array_equal(emit_ptr, [0, 1, 1, 1])
    np.testing.assert_array_equal(emit_idx, [1])


def test_wav_reference_fixture(reference_data_dir):
    samples = wav.read_16k_pcm(os.path.join(reference_data_dir,
                                            "en-us-hello.wav"))
    assert samples.dtype == np.float32
    # int16 scale, NOT normalized to ±1 (pcm_reader.cc:189-211)
    assert np.abs(samples).max() > 1.0
    # ~1 second of 16 kHz audio → 47 frames in the golden fbank dump
    assert 16000 * 0.4 < samples.size < 16000 * 3


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    samples = (rng.randn(1600) * 1000).astype(np.int16).astype(np.float32)
    path = str(tmp_path / "t.wav")
    wav.write_16k_pcm(path, samples)
    out = wav.read_16k_pcm(path)
    np.testing.assert_array_equal(out, samples)


def test_wav_strictness(tmp_path):
    path = str(tmp_path / "bad.wav")
    with open(path, "wb") as fd:
        fd.write(b"RIFF" + b"\x00" * 60)
    with pytest.raises(CorruptionError):
        wav.read_16k_pcm(path)
