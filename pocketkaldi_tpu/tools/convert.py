"""Offline model-conversion toolchain (Kaldi → pocketkaldi_tpu formats).

Re-implements the reference's converter suite (SURVEY.md §2.2) against the
same on-disk contracts, so existing Kaldi models can be packed for this
framework (and for the reference binary — the formats are shared):

  * ``convert_am``         — Kaldi nnet2 AM *text* dump (``nnet-am-copy``)
                             → NNT0 nnet + VEC0 prior
                             (reference: tool/convert_am.py)
  * ``convert_fst``        — OpenFST HCLG → ``pk::fst_0``; accepts BOTH the
                             binary container (VectorFst/ConstFst, parsed
                             hermetically by tools/openfst.py — the reference
                             needs the openfst python lib, tool/
                             convert_fstfmt.py:24-26) and AT&T text
                             (``fstprint`` output)
  * ``convert_words``      — Kaldi words.txt → SYM0 symbol table
                             (reference: tool/convert_words.py)
  * ``convert_trans``      — tid→pdf text dump → int32 VEC0
                             (reference: tool/convert_trans.py)
  * ``convert_cmvn_stats`` — Kaldi global CMVN stats (2×(D+1) text matrix)
                             → VEC0 of the first row (means+count; the
                             variance row is dropped, like the reference)
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from ..errors import CorruptionError
from ..fst import Fst
from ..io import binary
from ..io.symbols import SymbolTable


# ---------------------------------------------------------------------------
# Kaldi nnet2 text AM
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"<([A-Za-z0-9_/]+)>")


class _Cursor:
    """Token-oriented cursor over a Kaldi text dump."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def seek_token(self, name: str) -> None:
        idx = self.text.find(f"<{name}>", self.pos)
        if idx < 0:
            raise CorruptionError(f"unable to find token: <{name}>")
        self.pos = idx + len(name) + 2

    def peek_token(self):
        m = _TOKEN_RE.search(self.text, self.pos)
        return (m.group(1), m.start(), m.end()) if m else None

    def read_int(self) -> int:
        m = re.compile(r"\s*(-?\d+)").match(self.text, self.pos)
        if not m:
            raise CorruptionError("expected integer")
        self.pos = m.end()
        return int(m.group(1))

    def read_matrix(self, dtype=np.float64) -> np.ndarray:
        start = self.text.index("[", self.pos)
        end = self.text.index("]", start)
        body = self.text[start + 1:end]
        rows = [np.fromstring(line, sep=" ", dtype=dtype)
                for line in body.splitlines() if line.strip()]
        self.pos = end + 1
        if not rows:
            return np.zeros((0, 0), dtype=dtype)
        return np.vstack(rows)


def parse_nnet2_am_text(text: str) -> Tuple[binary.NnetSpec, np.ndarray,
                                            int, int]:
    """Parse an nnet2 AM text dump → (NnetSpec, prior, left_ctx, right_ctx).

    Handles the component set the reference supports: SpliceComponent
    (context extraction), AffineComponentPreconditionedOnline → Linear,
    RectifiedLinearComponent, NormalizeComponent, FixedScaleComponent → Mul,
    SoftmaxComponent.
    """
    cur = _Cursor(text)
    cur.seek_token("Nnet")
    cur.seek_token("NumComponents")
    num_components = cur.read_int()
    cur.seek_token("Components")
    end_components = text.find("</Components>")
    if end_components < 0:
        raise CorruptionError("missing </Components>")

    spec = binary.NnetSpec()
    left = right = 0
    while True:
        tok = cur.peek_token()
        if tok is None or tok[1] >= end_components:
            break
        name, _, tok_end = tok
        cur.pos = tok_end
        close = text.find(f"</{name}>", cur.pos)
        if close < 0:
            raise CorruptionError(f"missing </{name}>")
        section = _Cursor(text[cur.pos:close])
        if name == "SpliceComponent":
            section.seek_token("Context")
            ctx = section.read_matrix(dtype=np.int64).reshape(-1)
            left, right = int(-ctx[0]), int(ctx[-1])
        elif name == "AffineComponentPreconditionedOnline":
            section.seek_token("LinearParams")
            w = section.read_matrix()
            section.seek_token("BiasParams")
            b = section.read_matrix().reshape(-1)
            spec.layers.append(binary.LayerSpec(
                kind=binary.LAYER_LINEAR,
                weight=w.astype(np.float32),
                bias=b.astype(np.float32)))
        elif name == "RectifiedLinearComponent":
            spec.layers.append(binary.LayerSpec(kind=binary.LAYER_RELU))
        elif name == "NormalizeComponent":
            spec.layers.append(binary.LayerSpec(kind=binary.LAYER_NORMALIZE))
        elif name == "FixedScaleComponent":
            section.seek_token("Scales")
            scales = section.read_matrix().reshape(-1)
            spec.layers.append(binary.LayerSpec(
                kind=binary.LAYER_MUL, vec=scales.astype(np.float32)))
        elif name == "SoftmaxComponent":
            spec.layers.append(binary.LayerSpec(kind=binary.LAYER_SOFTMAX))
        else:
            raise CorruptionError(f"unexpected component: {name}")
        cur.pos = close + len(name) + 3

    # Priors follow </Nnet>
    after = text.find("</Nnet>")
    if after < 0:
        raise CorruptionError("missing </Nnet>")
    tail = _Cursor(text[after + len("</Nnet>"):])
    prior = tail.read_matrix().reshape(-1).astype(np.float32)
    return spec, prior, left, right


def convert_am(text_am_path: str, out_prefix: str) -> Tuple[int, int]:
    with open(text_am_path) as fd:
        spec, prior, left, right = parse_nnet2_am_text(fd.read())
    binary.write_nnet_file(out_prefix + ".nnet", spec)
    binary.write_vector_file(out_prefix + ".prior", prior)
    return left, right


# ---------------------------------------------------------------------------
# OpenFST (binary or text) → pk::fst_0
# ---------------------------------------------------------------------------

def convert_fst(fst_path: str, out_path: str) -> Fst:
    """OpenFST HCLG → ``pk::fst_0`` (reference: tool/convert_fstfmt.py).

    Dispatches on the file's leading magic: the OpenFST binary container
    (VectorFst or ConstFst, StdArc) is parsed directly — no openfst
    installation, no ``fstprint`` step — anything else is treated as AT&T
    text.
    """
    from . import openfst
    with open(fst_path, "rb") as fd:
        head = fd.read(4)
    if len(head) == 4 and \
            int.from_bytes(head, "little", signed=True) == openfst.FST_MAGIC:
        g = openfst.read_openfst(fst_path)
        fst = Fst.from_arrays(g.num_states, g.start, g.arc_source,
                              g.next_state, g.ilabel, g.olabel, g.weight,
                              g.final)
        fst.write(out_path)
        return fst
    return convert_fst_text(fst_path, out_path)


def convert_fst_text(fst_text_path: str, out_path: str) -> Fst:
    """AT&T text format: 'src dst ilabel olabel [weight]' / 'state [final]'."""
    arcs: List[Tuple[int, int, int, int, float]] = []
    finals: Dict[int, float] = {}
    max_state = -1
    start_state = None
    with open(fst_text_path) as fd:
        for line in fd:
            parts = line.split()
            if not parts:
                continue
            if len(parts) >= 4:
                src, dst, il, ol = map(int, parts[:4])
                w = float(parts[4]) if len(parts) > 4 else 0.0
                arcs.append((src, dst, il, ol, w))
                max_state = max(max_state, src, dst)
                if start_state is None:
                    start_state = src
            else:
                state = int(parts[0])
                w = float(parts[1]) if len(parts) > 1 else 0.0
                finals[state] = w
                max_state = max(max_state, state)
                if start_state is None:
                    start_state = state
    if start_state is None:
        raise CorruptionError(f"empty fst text file: {fst_text_path}")
    fst = Fst.from_arcs(max_state + 1, start_state, arcs, finals)
    fst.write(out_path)
    return fst


# ---------------------------------------------------------------------------
# words.txt → SYM0
# ---------------------------------------------------------------------------

def convert_words(words_txt_path: str, out_path: str) -> SymbolTable:
    """Kaldi words.txt ('word id' per line) → SYM0 (dense by id)."""
    pairs = []
    with open(words_txt_path) as fd:
        for line in fd:
            parts = line.split()
            if len(parts) != 2:
                continue
            pairs.append((int(parts[1]), parts[0]))
    if not pairs:
        raise CorruptionError(f"no symbols in {words_txt_path}")
    size = max(i for i, _ in pairs) + 1
    words = [""] * size
    for i, w in pairs:
        words[i] = w
    table = SymbolTable(words)
    table.write(out_path)
    return table


# ---------------------------------------------------------------------------
# tid→pdf dump → int32 VEC0
# ---------------------------------------------------------------------------

def convert_trans(trans_txt_path: str, out_path: str) -> np.ndarray:
    """Transition-id → pdf-id text dump → int32 VEC0.

    Input contract — the ``extract_id2pdf`` dump the reference consumes
    (tool/extract_id2pdf.cc:51-60, parsed by tool/convert_trans.py:15-22):

        line 1:  num_pdfs
        line 2:  num_transition_ids
        line 3+: ``tid pdf`` pairs for tid 0..num_transition_ids

    yielding a vector of length num_transition_ids+1 indexed by tid.  Since
    ``extract_id2pdf`` links against a full Kaldi build, the same dump can
    be produced without it from any Kaldi installation::

        copy-transition-model --binary=false final.mdl - | <tiny awk/py
        over the <Triples>/<Tuples> block>, or python + kaldi_io

    (see docs/KALDI_INGESTION.md for the exact recipe).  A bare
    whitespace-separated list of pdf-ids (indexed 1-based, slot 0 = 0) is
    also accepted for hand-built fixtures.
    """
    with open(trans_txt_path) as fd:
        lines = [ln.strip() for ln in fd if ln.strip()]
    if not lines:
        raise CorruptionError(f"empty file: {trans_txt_path}")
    pairwise = len(lines) >= 3 and len(lines[0].split()) == 1 and \
        len(lines[1].split()) == 1 and len(lines[2].split()) == 2
    if pairwise:
        num_transitions = int(lines[1])
        vec = np.zeros(num_transitions + 1, dtype=np.int32)
        for line in lines[2:]:
            tid, pdf = line.split()
            vec[int(tid)] = int(pdf)
    else:
        vals = [int(t) for ln in lines for t in ln.split()]
        vec = np.asarray(vals, dtype=np.int32)
    binary.write_vector_file(out_path, vec)
    return vec


def convert_trans_from_mdl(mdl_txt_path: str, out_path: str) -> np.ndarray:
    """Hermetic tid→pdf extraction from ``copy-transition-model
    --binary=false final.mdl`` text — no Kaldi linkage (closes the
    extract_id2pdf gap, VERDICT r2 #6; contract:
    /root/reference/tool/extract_id2pdf.cc:51-60).

    Replicates Kaldi's ``TransitionModel::ComputeDerived`` mapping:
    transition-states are the ``<Triples>``/``<Tuples>`` rows in order, each
    contributing one transition-id per topology transition of its
    (phone, hmm-state); a transition whose destination equals its source
    hmm-state is a self-loop and takes the tuple's self-loop pdf (Triples
    rows carry one pdf for both).  tid 0 is reserved (vec[0] = 0), matching
    the dump the reference's converter consumes.
    """
    with open(mdl_txt_path) as fd:
        toks = fd.read().split()
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expect=None):
        nonlocal pos
        if pos >= len(toks):
            raise CorruptionError(f"truncated transition model: wanted "
                                  f"{expect or 'token'} at end of file")
        t = toks[pos]
        pos += 1
        if expect is not None and t != expect:
            raise CorruptionError(
                f"transition model: expected {expect}, got {t}")
        return t

    take("<TransitionModel>")
    take("<Topology>")
    # phone → list over hmm-states of (list of transition destinations)
    topo = {}
    while peek() == "<TopologyEntry>":
        take("<TopologyEntry>")
        take("<ForPhones>")
        phones = []
        while peek() != "</ForPhones>":
            phones.append(int(take()))
        take("</ForPhones>")
        states = []
        while peek() == "<State>":
            take("<State>")
            idx = int(take())
            if idx != len(states):
                raise CorruptionError(
                    f"topology states out of order: {idx}")
            trans = []
            while peek() in ("<PdfClass>", "<ForwardPdfClass>",
                             "<SelfLoopPdfClass>", "<Transition>"):
                t = take()
                if t == "<Transition>":
                    trans.append(int(take()))
                    take()                      # probability, unused
                else:
                    take()                      # pdf-class id, unused
            take("</State>")
            states.append(trans)
        take("</TopologyEntry>")
        for p in phones:
            topo[p] = states
    take("</Topology>")

    kind = take()
    if kind not in ("<Triples>", "<Tuples>"):
        raise CorruptionError(f"expected <Triples>/<Tuples>, got {kind}")
    n = int(take())
    vec = [0]                                    # tid 0 reserved
    for _ in range(n):
        phone = int(take())
        hmm_state = int(take())
        forward_pdf = int(take())
        self_loop_pdf = int(take()) if kind == "<Tuples>" else forward_pdf
        if phone not in topo:
            raise CorruptionError(f"tuple references phone {phone} "
                                  "absent from the topology")
        if hmm_state >= len(topo[phone]):
            raise CorruptionError(
                f"tuple references hmm-state {hmm_state} beyond phone "
                f"{phone}'s topology ({len(topo[phone])} states)")
        for dest in topo[phone][hmm_state]:
            vec.append(self_loop_pdf if dest == hmm_state else forward_pdf)
    take("</Triples>" if kind == "<Triples>" else "</Tuples>")

    out = np.asarray(vec, dtype=np.int32)
    binary.write_vector_file(out_path, out)
    return out


# ---------------------------------------------------------------------------
# Global CMVN stats → VEC0
# ---------------------------------------------------------------------------

def convert_cmvn_stats(stats_txt_path: str, out_path: str) -> np.ndarray:
    """Kaldi 2×(D+1) text stats matrix → VEC0 of row 0 (sums + frame count).

    The variance row is dropped — the runtime normalizes means only
    (cmvn.cc Apply: mean subtraction, no variance)."""
    with open(stats_txt_path) as fd:
        text = fd.read()
    cur = _Cursor(text)
    mat = cur.read_matrix()
    if mat.shape[0] < 1:
        raise CorruptionError(f"no stats rows in {stats_txt_path}")
    row = mat[0].astype(np.float32)
    binary.write_vector_file(out_path, row)
    return row
