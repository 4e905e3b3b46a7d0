"""Synthetic model-pack generator.

The reference ships no end-to-end decode fixture (SURVEY.md §4 gap: no test
exercises Decoder/AcousticModel/pk_process).  This tool closes that gap by
generating a tiny but fully structured model pack in the reference's own
binary formats: nnet (NNT0), prior/tid2pdf/cmvn (VEC0), HCLG-like FST
(pk::fst_0), symbol table (SYM0), and the text Configuration manifest.

The FST built here mimics HCLG structure: emitting arcs labelled with
transition-ids (1-based), epsilon arcs (some with output word labels) forming
bounded-depth chains, self-loops, and a final state set.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..fst import Fst
from ..io import binary
from ..io.symbols import SymbolTable


@dataclass
class FixtureModel:
    conf_path: str
    num_pdfs: int
    num_tids: int
    feat_dim: int
    left_context: int
    right_context: int
    num_states: int
    words: List[str]


def make_nnet_spec(rng: np.random.RandomState, in_dim: int, hidden: int,
                   out_dim: int) -> binary.NnetSpec:
    """Small nnet2-style stack: Linear→ReLU→Normalize→Linear→Softmax."""
    def lin(i, o):
        return binary.LayerSpec(
            kind=binary.LAYER_LINEAR,
            weight=(rng.randn(o, i) * (1.0 / np.sqrt(i))).astype(np.float32),
            bias=(rng.randn(o) * 0.1).astype(np.float32))
    return binary.NnetSpec(layers=[
        lin(in_dim, hidden),
        binary.LayerSpec(kind=binary.LAYER_RELU),
        binary.LayerSpec(kind=binary.LAYER_NORMALIZE),
        lin(hidden, out_dim),
        binary.LayerSpec(kind=binary.LAYER_SOFTMAX),
    ])


def make_decoding_graph(rng: np.random.RandomState, num_states: int,
                        num_tids: int, num_words: int,
                        arcs_per_state: int = 3) -> Fst:
    """Random HCLG-shaped graph: emitting arcs with tids, eps word arcs."""
    arcs: List[Tuple[int, int, int, int, float]] = []
    for s in range(num_states):
        # emitting arcs (ilabel = transition id, 1-based)
        for _ in range(arcs_per_state):
            dst = int(rng.randint(num_states))
            tid = int(rng.randint(1, num_tids + 1))
            w = float(rng.rand() * 2.0)
            arcs.append((s, dst, tid, 0, w))
        # self-loop (HCLG's phone self-loops)
        arcs.append((s, s, int(rng.randint(1, num_tids + 1)), 0,
                     float(rng.rand() * 2.0)))
        # occasional epsilon arc, possibly emitting a word
        if rng.rand() < 0.5 and s + 1 < num_states:
            word = int(rng.randint(1, num_words)) if rng.rand() < 0.7 else 0
            arcs.append((s, s + 1, 0, word, float(rng.rand())))
    finals = {int(s): float(rng.rand())
              for s in rng.choice(num_states, size=max(1, num_states // 4),
                                  replace=False)}
    return Fst.from_arcs(num_states, 0, arcs, finals)


def write_fixture_model(outdir: str, seed: int = 0, feat_dim: int = 40,
                        left: int = 2, right: int = 2, hidden: int = 64,
                        num_pdfs: int = 32, num_tids: int = 96,
                        num_states: int = 50,
                        num_words: int = 20) -> FixtureModel:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(seed)

    in_dim = (left + 1 + right) * feat_dim
    spec = make_nnet_spec(rng, in_dim, hidden, num_pdfs)
    binary.write_nnet_file(os.path.join(outdir, "model.nnet"), spec)

    prior = (rng.rand(num_pdfs).astype(np.float32) + 0.1)
    prior /= prior.sum()
    binary.write_vector_file(os.path.join(outdir, "model.prior"), prior)

    # tid2pdf: slot 0 unused (tids are 1-based); decodable.cc indexes by tid.
    tid2pdf = rng.randint(0, num_pdfs, size=num_tids + 1).astype(np.int32)
    tid2pdf[0] = 0
    binary.write_vector_file(os.path.join(outdir, "model.tid2pdf"), tid2pdf)

    # global CMVN stats: plausible sums over `count` frames of log-mel ~ N(8, 2)
    count = 1000.0
    stats = np.concatenate([
        (rng.randn(feat_dim) * 2.0 + 8.0).astype(np.float32) * count,
        [count]]).astype(np.float32)
    binary.write_vector_file(os.path.join(outdir, "model.cmvn"), stats)

    graph = make_decoding_graph(rng, num_states, num_tids, num_words)
    graph.write(os.path.join(outdir, "model.fst"))

    words = ["<eps>"] + [f"word{i}" for i in range(1, num_words)]
    SymbolTable(words).write(os.path.join(outdir, "model.words"))

    conf_path = os.path.join(outdir, "model.conf")
    with open(conf_path, "w") as fd:
        fd.write("# synthetic pocketkaldi_tpu fixture model\n")
        fd.write("nnet = model.nnet\n")
        fd.write("prior = model.prior\n")
        fd.write("tid2pdf = model.tid2pdf\n")
        fd.write("cmvn_stats = model.cmvn\n")
        fd.write("fst = model.fst\n")
        fd.write("symbol_table = model.words\n")
        fd.write(f"left_context = {left}\n")
        fd.write(f"right_context = {right}\n")
        fd.write(f"num_pdfs = {num_pdfs}\n")
    return FixtureModel(conf_path=conf_path, num_pdfs=num_pdfs,
                        num_tids=num_tids, feat_dim=feat_dim,
                        left_context=left, right_context=right,
                        num_states=num_states, words=words)


if __name__ == "__main__":
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/model"
    m = write_fixture_model(out)
    print(f"wrote fixture model pack to {m.conf_path}")
