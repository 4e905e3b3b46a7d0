"""Readers/writers for the pocketkaldi binary section formats.

The container convention (reference ``util.cc:162-196``) is:

    4-char ASCII magic | int32 LE section-size (bytes of payload) | payload

Formats handled here (all little-endian):

  * ``VEC0``  — int32 dim, then ``dim`` raw values (float32 or int32).
                Reader: ``vector.cc:392-425`` / writer ``tool/convert_am.py``.
  * ``MAT0``  — payload is {int32 nrows, int32 ncols} (section size 8); each of
                the ``nrows`` rows then follows as its own ``VEC0`` section.
                Reader: ``matrix.cc:288-319``.
  * ``NNT0``  — payload {int32 num_layers} (size 4), followed by ``num_layers``
                ``LAY0`` sections.  Reader: ``nnet.cc:132-147``.
  * ``LAY0``  — payload {int32 layer_type} (size 4), or {int32 type, float
                scale} (size 8, Add layer); parameter sections follow outside
                the payload.  Reader: ``nnet.cc:80-130``.
  * ``SYM0``  — {int32 n, int32 buf_size, int32 offsets[n], packed '\0'
                strings}.  Reader: ``symbol_table.cc:23-73``.

The FST uses a different header (32-byte zero-padded magic, ``fst.cc:33-45``);
see ``pocketkaldi_tpu/fst.py``.

Writers are provided for every format so the toolchain (``tools/``) and test
fixtures can produce model packs that both this framework and the reference
binary can load.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import BinaryIO, List, Optional, Tuple

import numpy as np

from ..errors import CorruptionError, PkIOError

VECTOR_SECTION = b"VEC0"
MATRIX_SECTION = b"MAT0"
NNET_SECTION = b"NNT0"
LAYER_SECTION = b"LAY0"
SYMBOLTABLE_SECTION = b"SYM0"


class Reader:
    """A positioned reader over an open binary file (``util::ReadableFile``)."""

    def __init__(self, fd: BinaryIO, filename: str = ""):
        self.fd = fd
        self.filename = filename or getattr(fd, "name", "<stream>")

    @classmethod
    def open(cls, filename: str) -> "Reader":
        try:
            fd = open(filename, "rb")
        except OSError as e:
            raise PkIOError(f"unable to open {filename}") from e
        return cls(fd, filename)

    def close(self) -> None:
        self.fd.close()

    def __enter__(self) -> "Reader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def read_bytes(self, n: int) -> bytes:
        data = self.fd.read(n)
        if len(data) != n:
            raise CorruptionError(
                f"unexpected EOF reading {n} bytes from {self.filename}")
        return data

    def read_int32(self) -> int:
        return struct.unpack("<i", self.read_bytes(4))[0]

    def read_float(self) -> float:
        return struct.unpack("<f", self.read_bytes(4))[0]

    def expect_magic(self, magic: bytes) -> None:
        found = self.read_bytes(len(magic))
        if found != magic:
            raise CorruptionError(
                f"section '{magic.decode()}' expected, but "
                f"'{found!r}' found in {self.filename}")

    def read_section_head(self, magic: bytes) -> int:
        """Verify ``magic`` and return the payload byte size (util.cc:162-196)."""
        self.expect_magic(magic)
        return self.read_int32()


# ---------------------------------------------------------------------------
# VEC0
# ---------------------------------------------------------------------------

def read_vector(r: Reader, dtype=np.float32) -> np.ndarray:
    """Read a ``VEC0`` section as a 1-D array (vector.cc:392-425)."""
    section_size = r.read_section_head(VECTOR_SECTION)
    dim = r.read_int32()
    itemsize = np.dtype(dtype).itemsize
    if dim * itemsize + 4 != section_size:
        raise CorruptionError(
            f"VEC0: section_size {dim}*{itemsize}+4 expected, but "
            f"{section_size} found: {r.filename}")
    return np.frombuffer(r.read_bytes(dim * itemsize), dtype=dtype).copy()


def read_vector_file(filename: str, dtype=np.float32) -> np.ndarray:
    with Reader.open(filename) as r:
        return read_vector(r, dtype)


def write_vector(fd: BinaryIO, vec: np.ndarray) -> None:
    vec = np.ascontiguousarray(vec)
    if vec.dtype not in (np.dtype(np.float32), np.dtype(np.int32)):
        vec = vec.astype(np.float32)
    fd.write(VECTOR_SECTION)
    fd.write(struct.pack("<i", vec.size * vec.dtype.itemsize + 4))
    fd.write(struct.pack("<i", vec.size))
    fd.write(vec.tobytes())


def write_vector_file(filename: str, vec: np.ndarray) -> None:
    with open(filename, "wb") as fd:
        write_vector(fd, vec)


# ---------------------------------------------------------------------------
# MAT0
# ---------------------------------------------------------------------------

def read_matrix(r: Reader) -> np.ndarray:
    """Read a ``MAT0`` section: header + one ``VEC0`` per row (matrix.cc:288-319)."""
    section_size = r.read_section_head(MATRIX_SECTION)
    if section_size != 8:
        raise CorruptionError(
            f"MAT0: section_size == 8 expected, but {section_size} found: "
            f"{r.filename}")
    num_rows = r.read_int32()
    num_cols = r.read_int32()
    rows = np.empty((num_rows, num_cols), dtype=np.float32)
    for i in range(num_rows):
        row = read_vector(r)
        if row.size != num_cols:
            raise CorruptionError(
                f"MAT0: row dim {num_cols} expected, but {row.size} found: "
                f"{r.filename}")
        rows[i] = row
    return rows


def write_matrix(fd: BinaryIO, mat: np.ndarray) -> None:
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    fd.write(MATRIX_SECTION)
    fd.write(struct.pack("<i", 8))
    fd.write(struct.pack("<i", mat.shape[0]))
    fd.write(struct.pack("<i", mat.shape[1]))
    for row in mat:
        write_vector(fd, row)


# ---------------------------------------------------------------------------
# NNT0 / LAY0 — neural-network container
# ---------------------------------------------------------------------------

# Layer-type ids shared with the reference (nnet.h:14-20, tool/convert_am.py:16-22)
LAYER_LINEAR = 0
LAYER_RELU = 1
LAYER_NORMALIZE = 2
LAYER_SOFTMAX = 3
LAYER_ADD = 4
LAYER_MUL = 5


@dataclass
class LayerSpec:
    """One parsed ``LAY0`` layer: type id plus optional parameters."""
    kind: int
    weight: Optional[np.ndarray] = None   # Linear: (out_dim, in_dim) as stored
    bias: Optional[np.ndarray] = None     # Linear: (out_dim,)
    vec: Optional[np.ndarray] = None      # Mul/Add: per-dim vector
    scale: float = 1.0                    # Add: scalar multiplier on vec


@dataclass
class NnetSpec:
    layers: List[LayerSpec] = field(default_factory=list)


def read_nnet(r: Reader) -> NnetSpec:
    """Read an ``NNT0`` container (nnet.cc:132-147).

    Unlike the reference's ``ReadLayer`` (nnet.cc:106-127) — which declares
    layer ids 4 (Add) and 5 (Mul) but fails with Corruption on them — we load
    all six layer types, closing that reference gap (the converter emits Mul
    for Kaldi ``FixedScaleComponent``, tool/convert_am.py:213-217).
    """
    section_size = r.read_section_head(NNET_SECTION)
    if section_size != 4:
        raise CorruptionError(
            f"NNT0: section_size == 4 expected, but {section_size} found: "
            f"{r.filename}")
    num_layers = r.read_int32()
    spec = NnetSpec()
    for _ in range(num_layers):
        section_size = r.read_section_head(LAYER_SECTION)
        kind = r.read_int32()
        scale = 1.0
        if section_size == 8:
            # Add layers carry an extra float scale in the header payload
            # (tool/convert_am.py:93-97).
            scale = r.read_float()
        elif section_size != 4:
            raise CorruptionError(
                f"LAY0: section_size == 4 or 8 expected, but {section_size} "
                f"found: {r.filename}")
        layer = LayerSpec(kind=kind, scale=scale)
        if kind == LAYER_LINEAR:
            layer.weight = read_matrix(r)
            layer.bias = read_vector(r)
            if layer.bias.size != layer.weight.shape[0]:
                raise CorruptionError(
                    f"LAY0: linear bias dim {layer.bias.size} != out dim "
                    f"{layer.weight.shape[0]}: {r.filename}")
        elif kind in (LAYER_MUL, LAYER_ADD):
            layer.vec = read_vector(r)
        elif kind not in (LAYER_RELU, LAYER_NORMALIZE, LAYER_SOFTMAX):
            raise CorruptionError(
                f"LAY0: unexpected layer type: {kind} ({r.filename})")
        spec.layers.append(layer)
    return spec


def read_nnet_file(filename: str) -> NnetSpec:
    with Reader.open(filename) as r:
        return read_nnet(r)


def write_nnet(fd: BinaryIO, spec: NnetSpec) -> None:
    fd.write(NNET_SECTION)
    fd.write(struct.pack("<i", 4))
    fd.write(struct.pack("<i", len(spec.layers)))
    for layer in spec.layers:
        fd.write(LAYER_SECTION)
        if layer.kind == LAYER_ADD:
            fd.write(struct.pack("<i", 8))
            fd.write(struct.pack("<i", layer.kind))
            fd.write(struct.pack("<f", layer.scale))
        else:
            fd.write(struct.pack("<i", 4))
            fd.write(struct.pack("<i", layer.kind))
        if layer.kind == LAYER_LINEAR:
            write_matrix(fd, layer.weight)
            write_vector(fd, layer.bias)
        elif layer.kind in (LAYER_MUL, LAYER_ADD):
            write_vector(fd, layer.vec)


def write_nnet_file(filename: str, spec: NnetSpec) -> None:
    with open(filename, "wb") as fd:
        write_nnet(fd, spec)


# ---------------------------------------------------------------------------
# SYM0 — symbol table
# ---------------------------------------------------------------------------

def read_symbol_table(r: Reader) -> List[str]:
    """Read a ``SYM0`` section into a word-id → string list (symbol_table.cc:23-73)."""
    section_size = r.read_section_head(SYMBOLTABLE_SECTION)
    size = r.read_int32()
    buffer_size = r.read_int32()
    expected = 8 + size * 4 + buffer_size
    if section_size != expected:
        raise CorruptionError(
            f"SYM0: section_size == {expected} expected, but {section_size} "
            f"found: {r.filename}")
    offsets = np.frombuffer(r.read_bytes(size * 4), dtype=np.int32)
    buf = r.read_bytes(buffer_size)
    words = []
    for off in offsets:
        end = buf.index(b"\0", off)
        words.append(buf[off:end].decode("utf-8"))
    return words


def read_symbol_table_file(filename: str) -> List[str]:
    with Reader.open(filename) as r:
        return read_symbol_table(r)


def write_symbol_table(fd: BinaryIO, words: List[str]) -> None:
    encoded = [w.encode("utf-8") + b"\0" for w in words]
    offsets = np.cumsum([0] + [len(e) for e in encoded[:-1]], dtype=np.int32) \
        if encoded else np.zeros(0, dtype=np.int32)
    buf = b"".join(encoded)
    fd.write(SYMBOLTABLE_SECTION)
    fd.write(struct.pack("<i", 8 + len(words) * 4 + len(buf)))
    fd.write(struct.pack("<i", len(words)))
    fd.write(struct.pack("<i", len(buf)))
    fd.write(offsets.tobytes())
    fd.write(buf)


def write_symbol_table_file(filename: str, words: List[str]) -> None:
    with open(filename, "wb") as fd:
        write_symbol_table(fd, words)
