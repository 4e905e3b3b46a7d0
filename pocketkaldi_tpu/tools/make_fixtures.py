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


def make_bench_graph(rng: np.random.RandomState, num_states: int,
                     num_tids: int, num_words: int,
                     emit_arcs_per_state: int = 4,
                     weight_spread: float = 0.0,
                     word_on_emit: float = 0.0) -> Fst:
    """Vectorized large HCLG-shaped graph for benchmarking.

    Structure: per state, ``emit_arcs_per_state`` random emitting arcs plus a
    self-loop (HCLG phone self-loops); every 4th state gets one epsilon arc to
    its successor, 70% of which emit a word — by construction epsilon chains
    have depth 1, like a well-optimized HCLG's short eps runs.

    weight_spread > 0 draws arc weights from an exponential with that mean
    (real HCLG weights carry LM costs with long tails — uniform weights make
    every path equally plausible, which is maximally adversarial for beam
    pruning and unrepresentative of speech); 0 keeps uniform [0, 2).
    word_on_emit sets the fraction of emitting arcs carrying a word label
    (real HCLGs emit words on arcs, not only on epsilons).
    """
    s = num_states
    k = emit_arcs_per_state

    def w_draw(n, mean=2.0):
        if weight_spread > 0:
            return rng.exponential(weight_spread * mean / 2.0, size=n)
        return rng.rand(n) * mean

    src_emit = np.repeat(np.arange(s, dtype=np.int64), k)
    dst_emit = rng.randint(0, s, size=s * k)
    il_emit = rng.randint(1, num_tids + 1, size=s * k)
    ol_emit = np.where(rng.rand(s * k) < word_on_emit,
                       rng.randint(1, num_words, size=s * k), 0)
    w_emit = w_draw(s * k)

    src_loop = np.arange(s, dtype=np.int64)
    dst_loop = src_loop.copy()
    il_loop = rng.randint(1, num_tids + 1, size=s)
    ol_loop = np.zeros(s, dtype=np.int64)
    w_loop = w_draw(s, 1.0)

    eps_src = np.arange(0, s - 1, 4, dtype=np.int64)
    eps_dst = eps_src + 1
    eps_il = np.zeros(eps_src.size, dtype=np.int64)
    eps_ol = np.where(rng.rand(eps_src.size) < 0.7,
                      rng.randint(1, num_words, size=eps_src.size), 0)
    eps_w = w_draw(eps_src.size, 1.0)

    src = np.concatenate([src_emit, src_loop, eps_src])
    dst = np.concatenate([dst_emit, dst_loop, eps_dst])
    il = np.concatenate([il_emit, il_loop, eps_il])
    ol = np.concatenate([ol_emit, ol_loop, eps_ol])
    w = np.concatenate([w_emit, w_loop, eps_w])

    order = np.argsort(src, kind="stable")
    src, dst, il, ol, w = (a[order] for a in (src, dst, il, ol, w))

    first_arc = np.full(s, -1, dtype=np.int32)
    uniq, first_pos = np.unique(src, return_index=True)
    first_arc[uniq] = first_pos.astype(np.int32)

    final = np.full(s, np.inf, dtype=np.float32)
    final_states = rng.choice(s, size=max(1, s // 8), replace=False)
    final[final_states] = rng.rand(final_states.size).astype(np.float32)

    return Fst(start_state=0, final=final, first_arc=first_arc,
               next_state=dst.astype(np.int32), ilabel=il.astype(np.int32),
               olabel=ol.astype(np.int32), weight=w.astype(np.float32))


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


def write_bench_model(outdir: str, seed: int = 0, feat_dim: int = 40,
                      left: int = 5, right: int = 5, hidden: int = 1024,
                      num_hidden_layers: int = 3, num_pdfs: int = 3448,
                      num_tids: int = 10000, num_states: int = 100_000,
                      num_words: int = 8000, peakiness: float = 0.0,
                      weight_spread: float = 0.0,
                      word_on_emit: float = 0.0) -> FixtureModel:
    """Bench-scale model pack: nnet2-era AM + large synthetic HCLG.

    Dimensions mirror a typical mobile nnet2 recipe (splice ±5 of 40-dim
    fbank → several 1024-wide ReLU+Normalize layers → ~3.5k pdf softmax) and
    a six-figure-state decoding graph.  Written in the reference's formats so
    the same pack drives both this framework and the compiled reference
    binary for baseline measurement.

    ``peakiness`` scales the output layer's weights, sharpening the softmax:
    real acoustic models produce LOW-entropy posteriors on speech, while unit
    -scale random weights produce near-uniform ones — a degenerate workload
    where every decoding path stays in-beam.  ``weight_spread`` /
    ``word_on_emit`` structure the graph (see make_bench_graph).
    """
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    in_dim = (left + 1 + right) * feat_dim

    layers: List[binary.LayerSpec] = []
    dim = in_dim
    for _ in range(num_hidden_layers):
        layers.append(binary.LayerSpec(
            kind=binary.LAYER_LINEAR,
            weight=(rng.randn(hidden, dim) / np.sqrt(dim)).astype(np.float32),
            bias=(rng.randn(hidden) * 0.1).astype(np.float32)))
        layers.append(binary.LayerSpec(kind=binary.LAYER_RELU))
        layers.append(binary.LayerSpec(kind=binary.LAYER_NORMALIZE))
        dim = hidden
    out_scale = (peakiness if peakiness > 0 else 1.0) / np.sqrt(dim)
    layers.append(binary.LayerSpec(
        kind=binary.LAYER_LINEAR,
        weight=(rng.randn(num_pdfs, dim) * out_scale).astype(np.float32),
        bias=(rng.randn(num_pdfs) * 0.1).astype(np.float32)))
    layers.append(binary.LayerSpec(kind=binary.LAYER_SOFTMAX))
    binary.write_nnet_file(os.path.join(outdir, "model.nnet"),
                           binary.NnetSpec(layers=layers))

    prior = (rng.rand(num_pdfs).astype(np.float32) + 0.1)
    prior /= prior.sum()
    binary.write_vector_file(os.path.join(outdir, "model.prior"), prior)

    tid2pdf = rng.randint(0, num_pdfs, size=num_tids + 1).astype(np.int32)
    tid2pdf[0] = 0
    binary.write_vector_file(os.path.join(outdir, "model.tid2pdf"), tid2pdf)

    count = 5000.0
    stats = np.concatenate([
        (rng.randn(feat_dim) * 2.0 + 8.0).astype(np.float32) * count,
        [count]]).astype(np.float32)
    binary.write_vector_file(os.path.join(outdir, "model.cmvn"), stats)

    graph = make_bench_graph(rng, num_states, num_tids, num_words,
                             weight_spread=weight_spread,
                             word_on_emit=word_on_emit)
    graph.write(os.path.join(outdir, "model.fst"))

    words = ["<eps>"] + [f"w{i:05d}" for i in range(1, num_words)]
    SymbolTable(words).write(os.path.join(outdir, "model.words"))

    conf_path = os.path.join(outdir, "model.conf")
    with open(conf_path, "w") as fd:
        fd.write("# pocketkaldi_tpu bench model pack\n")
        fd.write(f"# pack: seed={seed} peakiness={peakiness} "
                 f"weight_spread={weight_spread} "
                 f"word_on_emit={word_on_emit}\n")
        fd.write("nnet = model.nnet\nprior = model.prior\n")
        fd.write("tid2pdf = model.tid2pdf\ncmvn_stats = model.cmvn\n")
        fd.write("fst = model.fst\nsymbol_table = model.words\n")
        fd.write(f"left_context = {left}\nright_context = {right}\n")
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
