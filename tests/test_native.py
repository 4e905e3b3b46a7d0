"""Native C++ host-runtime library tests (build + parity with Python paths)."""

import numpy as np
import pytest

from pocketkaldi_tpu.errors import CorruptionError
from pocketkaldi_tpu.io import native, wav


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_wav_matches_python(lib, tmp_path):
    rng = np.random.RandomState(50)
    samples = (rng.randn(3200) * 2000).astype(np.int16).astype(np.float32)
    p = str(tmp_path / "x.wav")
    wav.write_16k_pcm(p, samples)
    nat = native.read_wav_16k_mono(p)
    with open(p, "rb") as fd:
        py = wav.parse_16k_pcm(fd.read(), p)
    np.testing.assert_array_equal(nat, py)
    np.testing.assert_array_equal(nat, samples)


def test_native_wav_strictness(lib, tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as fd:
        fd.write(b"RIFF" + b"\x00" * 60)
    with pytest.raises(CorruptionError):
        native.read_wav_16k_mono(p)


def test_native_traceback_matches_python(lib):
    from pocketkaldi_tpu.decoder.decoder import _traceback
    rng = np.random.RandomState(51)
    b_sz, t_sz, g_sz, g0, k = 3, 6, 3, 2, 8
    prev = rng.randint(0, k, size=(b_sz, t_sz, g_sz, k)).astype(np.int32)
    word = np.where(rng.rand(b_sz, t_sz, g_sz, k) < 0.3,
                    rng.randint(1, 50, size=(b_sz, t_sz, g_sz, k)),
                    0).astype(np.int32)
    init_prev = rng.randint(0, k, size=(b_sz, g0, k)).astype(np.int32)
    init_word = np.where(rng.rand(b_sz, g0, k) < 0.3,
                         rng.randint(1, 50, size=(b_sz, g0, k)),
                         0).astype(np.int32)
    slots = np.array([2, -1, 5], dtype=np.int32)
    num_frames = np.array([6, 6, 4], dtype=np.int32)

    got = native.traceback_batch(prev, word, init_prev, init_word, slots,
                                 num_frames)
    for i in range(b_sz):
        if slots[i] < 0:
            assert got[i] == []
            continue
        want = _traceback(int(slots[i]), prev[i], word[i], init_prev[i],
                          init_word[i], int(num_frames[i]))
        assert got[i] == want
