"""Strict 16 kHz mono PCM WAV reader.

Behavioural spec is the reference's ``pk_16kpcm_read`` (``src/pcm_reader.cc:45-220``):

  * Requires RIFF/WAVE, ``fmt `` subchunk of size 16, PCM (format 1), mono,
    exactly 16000 Hz, 8/16/32 bits per sample.
  * Validates every header field (chunk sizes against file size, byte rate,
    block align).
  * Emits float32 samples at the *integer* sample scale (e.g. int16 range
    ±32768) — NOT normalized to ±1.  Kaldi-compatible fbank depends on this.

A native C++ fast path lives in ``native/pktpu_io.cc`` (see ``io/native.py``);
this module is the canonical pure-Python implementation and the fallback.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import CorruptionError, PkIOError

SAMPLE_RATE = 16000


def read_16k_pcm(filename: str) -> np.ndarray:
    """Read ``filename`` and return float32 samples in int-range scale.

    Uses the native C++ parser (native/pktpu_io.cc) when the library is
    built; falls back to the pure-Python parser below.
    """
    from . import native
    if native.available():
        return native.read_wav_16k_mono(filename)
    try:
        with open(filename, "rb") as fd:
            data = fd.read()
    except OSError as e:
        raise PkIOError(f"unable to open {filename}") from e
    return parse_16k_pcm(data, filename)


def parse_16k_pcm(data: bytes, filename: str = "<bytes>") -> np.ndarray:
    file_size = len(data)
    if file_size < 44:
        raise CorruptionError(f"file too small for a WAV header: {filename}")

    def fail(msg):
        raise CorruptionError(f"{msg}: {filename}")

    if data[0:4] != b"RIFF":
        fail("chunk_name == 'RIFF' expected")
    (chunk_size,) = struct.unpack_from("<i", data, 4)
    if chunk_size != file_size - 8:
        fail(f"chunk_size == {file_size - 8} expected, but {chunk_size} found")
    if data[8:12] != b"WAVE":
        fail("Format == 'WAVE' expected")
    if data[12:16] != b"fmt ":
        fail("subchunk1 == 'fmt ' expected")
    (subchunk1_size,) = struct.unpack_from("<i", data, 16)
    if subchunk1_size != 16:
        fail(f"subchunk1_size == 16 expected, but {subchunk1_size} found")
    audio_format, num_channels = struct.unpack_from("<hh", data, 20)
    if audio_format != 1:
        fail(f"audio_format == 1 (PCM) expected, but {audio_format} found")
    if num_channels != 1:
        fail(f"num_channels == 1 (mono) expected, but {num_channels} found")
    (sample_rate,) = struct.unpack_from("<i", data, 24)
    if sample_rate != SAMPLE_RATE:
        fail(f"sample_rate == 16000 expected, but {sample_rate} found")
    bytes_rate, block_align, bits_per_sample = struct.unpack_from("<ihh", data, 28)
    if bytes_rate != sample_rate * bits_per_sample // 8:
        fail(f"bytes_rate == {sample_rate * bits_per_sample // 8} expected, "
             f"but {bytes_rate} found")
    if block_align != bits_per_sample // 8:
        fail(f"block_align == {bits_per_sample // 8} expected, but "
             f"{block_align} found")
    if data[36:40] != b"data":
        fail("subchunk2 == 'data' expected")
    (subchunk2_size,) = struct.unpack_from("<i", data, 40)
    if subchunk2_size != file_size - 44:
        fail(f"subchunk2_size == {file_size - 44} expected, but "
             f"{subchunk2_size} found")

    payload = data[44:]
    if bits_per_sample == 8:
        samples = np.frombuffer(payload, dtype=np.int8)
    elif bits_per_sample == 16:
        samples = np.frombuffer(payload, dtype="<i2")
    elif bits_per_sample == 32:
        samples = np.frombuffer(payload, dtype="<i4")
    else:
        fail(f"bits_per_sample == 8, 16 or 32 expected, but "
             f"{bits_per_sample} found")
    return samples.astype(np.float32)


def write_16k_pcm(filename: str, samples: np.ndarray) -> None:
    """Write int16 mono 16 kHz WAV (test-fixture helper; no reference analogue)."""
    pcm = np.clip(np.asarray(samples), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    with open(filename, "wb") as fd:
        fd.write(b"RIFF")
        fd.write(struct.pack("<i", 36 + len(payload)))
        fd.write(b"WAVEfmt ")
        fd.write(struct.pack("<ihhiihh", 16, 1, 1, SAMPLE_RATE,
                             SAMPLE_RATE * 2, 2, 16))
        fd.write(b"data")
        fd.write(struct.pack("<i", len(payload)))
        fd.write(payload)
