"""Offline model-conversion toolchain (Kaldi → pocketkaldi_tpu formats).

Re-implements the reference's converter suite (SURVEY.md §2.2) against the
same on-disk contracts, so existing Kaldi models can be packed for this
framework (and for the reference binary — the formats are shared):

  * ``convert_am``         — Kaldi nnet2 AM *text* dump (``nnet-am-copy``)
                             → NNT0 nnet + VEC0 prior
                             (reference: tool/convert_am.py)
  * ``convert_fst_text``   — OpenFST *text* (AT&T) HCLG → ``pk::fst_0``
                             (reference: tool/convert_fstfmt.py, which reads
                             the binary via the openfst python lib; text
                             input keeps this tool dependency-free)
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
# OpenFST text → pk::fst_0
# ---------------------------------------------------------------------------

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
    """Text dump of the transition-id → pdf-id map (one int per line or
    'tid pdf' pairs) → int32 VEC0, 1-based tid indexing with slot 0 = 0."""
    vals = []
    with open(trans_txt_path) as fd:
        tokens = fd.read().split()
    if not tokens:
        raise CorruptionError(f"empty file: {trans_txt_path}")
    vals = [int(t) for t in tokens]
    vec = np.asarray(vals, dtype=np.int32)
    binary.write_vector_file(out_path, vec)
    return vec


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
