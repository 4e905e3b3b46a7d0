"""Minimal OpenFST binary reader (StdArc VectorFst / ConstFst) — no openfst.

The reference's FST converter consumes OpenFST *binary* graphs through the
``fst`` python wrapper (``tool/convert_fstfmt.py:24-26``), so converting a
stock Kaldi model pack there requires OpenFST installed.  This module parses
the two container types Kaldi emits for HCLG (``fstcompile``/``mkgraph.sh``
produce VectorFst; ``fstconvert --fst_type=const`` produces ConstFst)
directly from their on-disk layout, making the conversion hermetic.

On-disk layout (OpenFST ``fst/fst.cc`` FstHeader, ``fst/vector-fst.h``,
``fst/const-fst.h``; all little-endian):

    FstHeader:
        int32   magic = 2125659606
        string  fsttype            ("vector" | "const");  string = int32 len
        string  arctype            ("standard")                     + bytes
        int32   version
        int32   flags              (bit 1: embedded input symbols,
                                    bit 2: embedded output symbols)
        uint64  properties
        int64   start
        int64   numstates
        int64   numarcs
    [embedded SymbolTable per flag bit — parsed and skipped]
    VectorFst body (version >= 2), per state:
        float   final              (tropical weight; +inf = non-final
                                    serialized as FloatLimits::PosInfinity)
        int64   narcs
        narcs × {int32 ilabel; int32 olabel; float weight; int32 nextstate}
    ConstFst body (version 2; the ancient aligned version 1 is rejected):
        numstates × {float final; uint32 pos; uint32 narcs;
                     uint32 niepsilons; uint32 noepsilons}
        numarcs   × {int32 ilabel; int32 olabel; float weight;
                     int32 nextstate}

Only the tropical ("standard") arc type is supported — that is what HCLG
decoding graphs use.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..errors import CorruptionError

FST_MAGIC = 2125659606
SYMBOL_TABLE_MAGIC = 2125658996
HAS_ISYMBOLS = 0x1
HAS_OSYMBOLS = 0x2

ARC_DTYPE = np.dtype([("ilabel", "<i4"), ("olabel", "<i4"),
                      ("weight", "<f4"), ("nextstate", "<i4")])
CONST_STATE_DTYPE = np.dtype([("final", "<f4"), ("pos", "<u4"),
                              ("narcs", "<u4"), ("niepsilons", "<u4"),
                              ("noepsilons", "<u4")])


@dataclass
class OpenFstGraph:
    """Parsed OpenFST graph in flat struct-of-arrays form."""
    start: int
    num_states: int
    final: np.ndarray        # (S,) float32, +inf = non-final
    arc_source: np.ndarray   # (A,) int32
    ilabel: np.ndarray       # (A,) int32
    olabel: np.ndarray       # (A,) int32
    weight: np.ndarray       # (A,) float32
    next_state: np.ndarray   # (A,) int32


class _Stream:
    def __init__(self, buf: bytes, name: str):
        self.buf = buf
        self.pos = 0
        self.name = name

    def need(self, n: int) -> None:
        if self.pos + n > len(self.buf):
            raise CorruptionError(
                f"truncated OpenFST file (need {n} bytes at offset "
                f"{self.pos}, have {len(self.buf)}): {self.name}")

    def read(self, fmt: str):
        size = struct.calcsize(fmt)
        self.need(size)
        out = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return out if len(out) > 1 else out[0]

    def read_string(self) -> str:
        n = self.read("<i")
        if n < 0 or n > 1 << 20:
            raise CorruptionError(
                f"implausible string length {n} in {self.name}")
        self.need(n)
        s = self.buf[self.pos:self.pos + n]
        self.pos += n
        return s.decode("utf-8", errors="replace")

    def read_array(self, dtype: np.dtype, count: int) -> np.ndarray:
        nbytes = dtype.itemsize * count
        self.need(nbytes)
        arr = np.frombuffer(self.buf, dtype=dtype, count=count,
                            offset=self.pos)
        self.pos += nbytes
        return arr


def _skip_symbol_table(s: _Stream) -> None:
    """Parse past an embedded SymbolTable (fst/symbol-table.cc layout)."""
    magic = s.read("<i")
    if magic != SYMBOL_TABLE_MAGIC:
        raise CorruptionError(
            f"bad embedded symbol-table magic {magic} in {s.name}")
    s.read_string()                    # table name
    s.read("<q")                       # available key
    size = s.read("<q")
    for _ in range(size):
        s.read_string()                # symbol
        s.read("<q")                   # key


def read_openfst(path: str) -> OpenFstGraph:
    """Read a binary OpenFST StdArc VectorFst or ConstFst."""
    with open(path, "rb") as fd:
        buf = fd.read()
    s = _Stream(buf, path)

    magic = s.read("<i")
    if magic != FST_MAGIC:
        raise CorruptionError(
            f"not an OpenFST binary file (magic {magic} != {FST_MAGIC}): "
            f"{path}")
    fsttype = s.read_string()
    arctype = s.read_string()
    version = s.read("<i")
    flags = s.read("<i")
    s.read("<Q")                       # properties (unused here)
    start = s.read("<q")
    num_states = s.read("<q")
    num_arcs = s.read("<q")

    if arctype != "standard":
        raise CorruptionError(
            f"unsupported OpenFST arc type '{arctype}' (only tropical "
            f"'standard' arcs — HCLG graphs — are supported): {path}")
    if num_states < 0 or num_arcs < 0:
        raise CorruptionError(
            f"OpenFST header carries no state/arc counts (streamed write?) "
            f"— rewrite the graph with fstcompile/fstconvert: {path}")
    if flags & HAS_ISYMBOLS:
        _skip_symbol_table(s)
    if flags & HAS_OSYMBOLS:
        _skip_symbol_table(s)

    if fsttype == "vector":
        if version < 2:
            raise CorruptionError(
                f"VectorFst file version {version} < 2 unsupported: {path}")
        return _read_vector_body(s, start, num_states, num_arcs)
    if fsttype == "const":
        if version != 2:
            raise CorruptionError(
                f"ConstFst file version {version} != 2 unsupported (the "
                f"aligned v1 layout predates Kaldi): {path}")
        return _read_const_body(s, start, num_states, num_arcs)
    raise CorruptionError(
        f"unsupported OpenFST container '{fsttype}' (vector/const only): "
        f"{path}")


def _read_vector_body(s: _Stream, start: int, num_states: int,
                      num_arcs: int) -> OpenFstGraph:
    final = np.empty(num_states, dtype=np.float32)
    srcs = np.empty(num_arcs, dtype=np.int32)
    arcs = np.empty(num_arcs, dtype=ARC_DTYPE)
    a = 0
    for st in range(num_states):
        final[st], narcs = s.read("<fq")
        if narcs < 0 or a + narcs > num_arcs:
            raise CorruptionError(
                f"arc count overflow at state {st} ({narcs} arcs, "
                f"{num_arcs - a} remaining per header): {s.name}")
        arcs[a:a + narcs] = s.read_array(ARC_DTYPE, narcs)
        srcs[a:a + narcs] = st
        a += narcs
    if a != num_arcs:
        raise CorruptionError(
            f"arc total mismatch: header says {num_arcs}, states carried "
            f"{a}: {s.name}")
    return _to_graph(start, num_states, final, srcs, arcs)


def _read_const_body(s: _Stream, start: int, num_states: int,
                     num_arcs: int) -> OpenFstGraph:
    states = s.read_array(CONST_STATE_DTYPE, num_states)
    arcs = s.read_array(ARC_DTYPE, num_arcs)
    final = states["final"].astype(np.float32)
    narcs = states["narcs"].astype(np.int64)
    pos = states["pos"].astype(np.int64)
    if narcs.sum() != num_arcs:
        raise CorruptionError(
            f"ConstFst arc total mismatch: states carry {int(narcs.sum())}, "
            f"header says {num_arcs}: {s.name}")
    # ConstFst addresses each state's arcs by `pos`; gather them into
    # state-sequential order (positions pos[s]..pos[s]+narcs[s] per state).
    order = np.repeat(pos, narcs) + _segment_arange(narcs)
    if order.size and (order.min() < 0 or order.max() >= num_arcs):
        raise CorruptionError(f"ConstFst arc position out of range: {s.name}")
    srcs_seq = np.repeat(np.arange(num_states, dtype=np.int32), narcs)
    return _to_graph(start, num_states, final, srcs_seq, arcs[order])


def _segment_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), … concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts,
                                                        counts)


def _to_graph(start, num_states, final, srcs, arcs) -> OpenFstGraph:
    return OpenFstGraph(
        start=int(start), num_states=int(num_states), final=final,
        arc_source=srcs.astype(np.int32),
        ilabel=arcs["ilabel"].astype(np.int32),
        olabel=arcs["olabel"].astype(np.int32),
        weight=arcs["weight"].astype(np.float32),
        next_state=arcs["nextstate"].astype(np.int32))


# ---------------------------------------------------------------------------
# Writers mirroring the same layout (test fixtures; OpenFST is not in the
# image, so round-tripping through these is how the reader is validated).
# ---------------------------------------------------------------------------

def _write_header(fd, fsttype: str, version: int, start: int,
                  num_states: int, num_arcs: int, flags: int = 0) -> None:
    fd.write(struct.pack("<i", FST_MAGIC))
    for text in (fsttype, "standard"):
        raw = text.encode()
        fd.write(struct.pack("<i", len(raw)) + raw)
    fd.write(struct.pack("<ii", version, flags))
    fd.write(struct.pack("<Q", 0))
    fd.write(struct.pack("<qqq", start, num_states, num_arcs))


def write_vector_fst(path: str, start: int, num_states: int,
                     final: np.ndarray, arc_source: np.ndarray,
                     ilabel, olabel, weight, next_state) -> None:
    order = np.argsort(arc_source, kind="stable")
    arcs = np.empty(len(order), dtype=ARC_DTYPE)
    arcs["ilabel"] = np.asarray(ilabel)[order]
    arcs["olabel"] = np.asarray(olabel)[order]
    arcs["weight"] = np.asarray(weight)[order]
    arcs["nextstate"] = np.asarray(next_state)[order]
    counts = np.bincount(np.asarray(arc_source), minlength=num_states)
    with open(path, "wb") as fd:
        _write_header(fd, "vector", 2, start, num_states, len(order))
        a = 0
        for st in range(num_states):
            fd.write(struct.pack("<fq", float(final[st]), int(counts[st])))
            fd.write(arcs[a:a + counts[st]].tobytes())
            a += counts[st]


def write_const_fst(path: str, start: int, num_states: int,
                    final: np.ndarray, arc_source: np.ndarray,
                    ilabel, olabel, weight, next_state) -> None:
    order = np.argsort(arc_source, kind="stable")
    arcs = np.empty(len(order), dtype=ARC_DTYPE)
    arcs["ilabel"] = np.asarray(ilabel)[order]
    arcs["olabel"] = np.asarray(olabel)[order]
    arcs["weight"] = np.asarray(weight)[order]
    arcs["nextstate"] = np.asarray(next_state)[order]
    counts = np.bincount(np.asarray(arc_source),
                         minlength=num_states).astype(np.uint32)
    states = np.zeros(num_states, dtype=CONST_STATE_DTYPE)
    states["final"] = np.asarray(final, dtype=np.float32)
    states["narcs"] = counts
    states["pos"][1:] = np.cumsum(counts)[:-1]
    with open(path, "wb") as fd:
        _write_header(fd, "const", 2, start, num_states, len(order))
        fd.write(states.tobytes())
        fd.write(arcs.tobytes())
