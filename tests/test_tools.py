"""Toolchain tests: converters round-trip + WER harness."""

import numpy as np
import pytest

from pocketkaldi_tpu.fst import Fst
from pocketkaldi_tpu.io import binary
from pocketkaldi_tpu.io.symbols import SymbolTable
from pocketkaldi_tpu.tools import convert
from pocketkaldi_tpu.utils.wer import align, corpus_wer


NNET2_TEXT = """<Nnet> <NumComponents> 5 <Components>
<SpliceComponent> <InputDim> 4 <Context> [ -1 0 1 ] </SpliceComponent>
<AffineComponentPreconditionedOnline> <LearningRate> 0.001
<LinearParams> [
 0.1 0.2 0.3 0.4 0.5 0.6 0.7 0.8 0.9 1.0 1.1 1.2
 -0.1 -0.2 -0.3 -0.4 -0.5 -0.6 -0.7 -0.8 -0.9 -1.0 -1.1 -1.2 ]
<BiasParams> [ 0.5 -0.5 ]
</AffineComponentPreconditionedOnline>
<RectifiedLinearComponent> <Dim> 2 </RectifiedLinearComponent>
<FixedScaleComponent> <Scales> [ 2.0 0.5 ] </FixedScaleComponent>
<SoftmaxComponent> <Dim> 2 </SoftmaxComponent>
</Components> </Nnet>
 [ 0.6 0.4 ]
"""


def test_convert_am(tmp_path):
    src = tmp_path / "am.txt"
    src.write_text(NNET2_TEXT)
    left, right = convert.convert_am(str(src), str(tmp_path / "out"))
    assert (left, right) == (1, 1)
    spec = binary.read_nnet_file(str(tmp_path / "out.nnet"))
    kinds = [l.kind for l in spec.layers]
    assert kinds == [binary.LAYER_LINEAR, binary.LAYER_RELU,
                     binary.LAYER_MUL, binary.LAYER_SOFTMAX]
    assert spec.layers[0].weight.shape == (2, 12)
    np.testing.assert_allclose(spec.layers[0].bias, [0.5, -0.5])
    np.testing.assert_allclose(spec.layers[2].vec, [2.0, 0.5])
    prior = binary.read_vector_file(str(tmp_path / "out.prior"))
    np.testing.assert_allclose(prior, [0.6, 0.4])


def test_convert_fst_text(tmp_path):
    src = tmp_path / "g.txt"
    src.write_text("0 1 1 10 0.5\n0 2 2 0 1.0\n1 2 0 20 0.25\n2 0.125\n")
    fst = convert.convert_fst_text(str(src), str(tmp_path / "g.fst"))
    loaded = Fst.read(str(tmp_path / "g.fst"))
    assert loaded.start_state == 0
    assert loaded.num_states == 3
    assert loaded.num_arcs == 3
    assert loaded.final_weight(2) == 0.125
    assert np.isinf(loaded.final_weight(0))
    # arc with default weight 0 handling
    src2 = tmp_path / "g2.txt"
    src2.write_text("0 1 1 1\n1\n")
    f2 = convert.convert_fst_text(str(src2), str(tmp_path / "g2.fst"))
    assert f2.final_weight(1) == 0.0
    assert f2.weight[0] == 0.0


def test_convert_words(tmp_path):
    src = tmp_path / "words.txt"
    src.write_text("<eps> 0\nhello 1\nworld 2\n")
    convert.convert_words(str(src), str(tmp_path / "w.bin"))
    table = SymbolTable.read(str(tmp_path / "w.bin"))
    assert table.get(0) == "<eps>"
    assert table.get(1) == "hello"
    assert table.get(2) == "world"


def test_convert_trans(tmp_path):
    src = tmp_path / "t.txt"
    src.write_text("0\n0\n1\n1\n2\n")
    vec = convert.convert_trans(str(src), str(tmp_path / "t.bin"))
    loaded = binary.read_vector_file(str(tmp_path / "t.bin"), dtype=np.int32)
    np.testing.assert_array_equal(loaded, [0, 0, 1, 1, 2])


def test_convert_cmvn_stats(tmp_path):
    src = tmp_path / "s.txt"
    src.write_text(" [ 10 20 30 5\n 1 2 3 0 ]\n")
    row = convert.convert_cmvn_stats(str(src), str(tmp_path / "s.bin"))
    loaded = binary.read_vector_file(str(tmp_path / "s.bin"))
    np.testing.assert_allclose(loaded, [10, 20, 30, 5])


def test_wer():
    r = align("the cat sat".split(), "the cat sat".split())
    assert r.wer == 0.0
    r = align("the cat sat".split(), "the bat sat down".split())
    assert r.substitutions == 1 and r.insertions == 1 and r.deletions == 0
    assert r.wer == pytest.approx(2 / 3)
    r = corpus_wer(["a b c", "d e"], ["a b c", "d"])
    assert r.errors == 1 and r.ref_words == 5
    assert r.wer == pytest.approx(0.2)


def test_compute_fbank_tool(tmp_path, reference_data_dir):
    """The fbank dump tool (tool/compute_fbank.cc analogue) matches golden."""
    import os
    from pocketkaldi_tpu.tools.compute_fbank import dump_fbank_ark
    scp = tmp_path / "wav.scp"
    scp.write_text(
        f"hello {os.path.join(reference_data_dir, 'en-us-hello.wav')}\n")
    out = tmp_path / "fb.ark"
    n = dump_fbank_ark(str(scp), str(out))
    assert n == 1
    text = out.read_text()
    assert text.startswith("hello  [")
    vals = np.array([float(t) for t in
                     text.replace("hello  [", "").replace("]", "").split()])
    golden = np.array([float(t) for t in open(os.path.join(
        reference_data_dir, "fbankmat_en-us-hello.wav.txt")).read().split()])
    assert vals.size == golden.size == 1880
    assert np.abs(vals - golden).max() < 5e-5
