"""Length bucketing for heterogeneous utterance batches.

Static shapes mean every distinct (batch, padded-length) pair is a separate
compiled program, and padding everything to the global max wastes compute on
short utterances.  Buckets quantize padded lengths to a small geometric
ladder and cap batch size, so an arbitrary scp decodes with a handful of
compilations and bounded padding waste (the reference's scp handling is a
serial per-file loop, main.cc:34-46 — no batching at all).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np


def bucket_length(n: int, base: int = 16000, growth: float = 1.5) -> int:
    """Smallest ladder rung ≥ n: base · growth^k (base = 1 s of 16 kHz audio)."""
    if n <= base:
        return base
    k = int(np.ceil(np.log(n / base) / np.log(growth)))
    return int(round(base * growth ** k))


def make_buckets(lengths: Sequence[int], max_batch: int = 64,
                 base: int = 16000, growth: float = 1.5
                 ) -> List[Tuple[int, List[int]]]:
    """Group utterance indices into (padded_length, indices) buckets.

    Keeps input order within each bucket; splits buckets at ``max_batch``.
    """
    by_len = {}
    for i, n in enumerate(lengths):
        by_len.setdefault(bucket_length(int(n), base, growth), []).append(i)
    out: List[Tuple[int, List[int]]] = []
    for padded in sorted(by_len):
        idxs = by_len[padded]
        for lo in range(0, len(idxs), max_batch):
            out.append((padded, idxs[lo:lo + max_batch]))
    return out


def decode_bucketed(recognizer, waves: Sequence[np.ndarray],
                    max_batch: int = 64):
    """Decode an arbitrary wave list via buckets; preserves input order."""
    lengths = [int(np.shape(w)[-1]) for w in waves]
    results = [None] * len(waves)
    for padded, idxs in make_buckets(lengths, max_batch=max_batch):
        batch = [waves[i] for i in idxs]
        utts = recognizer.process_batch(batch, bucket=padded)
        for i, utt in zip(idxs, utts):
            results[i] = utt
    return results
