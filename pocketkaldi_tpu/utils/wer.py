"""Word-error-rate harness.

The reference surfaces only avg log-likelihood per frame as a quality metric
(main.cc:28); a WER harness is required by BASELINE.md's protocol (WER delta
vs reference transcripts = 0).  Standard Levenshtein alignment over word
sequences.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence


@dataclass
class WerResult:
    substitutions: int
    insertions: int
    deletions: int
    ref_words: int

    @property
    def errors(self) -> int:
        return self.substitutions + self.insertions + self.deletions

    @property
    def wer(self) -> float:
        if self.ref_words == 0:
            return 0.0 if self.errors == 0 else float("inf")
        return self.errors / self.ref_words

    def __add__(self, other: "WerResult") -> "WerResult":
        return WerResult(self.substitutions + other.substitutions,
                         self.insertions + other.insertions,
                         self.deletions + other.deletions,
                         self.ref_words + other.ref_words)


def align(ref: Sequence[str], hyp: Sequence[str]) -> WerResult:
    """Levenshtein alignment counts (sub/ins/del) between word sequences."""
    n, m = len(ref), len(hyp)
    # dp[j] = (cost, subs, ins, dels) for prefix alignment
    prev = [(j, 0, j, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i)] + [None] * m
        for j in range(1, m + 1):
            match = ref[i - 1] == hyp[j - 1]
            # substitution / match
            c_sub = (prev[j - 1][0] + (0 if match else 1),
                     prev[j - 1][1] + (0 if match else 1),
                     prev[j - 1][2], prev[j - 1][3])
            # insertion (extra hyp word)
            c_ins = (cur[j - 1][0] + 1, cur[j - 1][1],
                     cur[j - 1][2] + 1, cur[j - 1][3])
            # deletion (missing ref word)
            c_del = (prev[j][0] + 1, prev[j][1], prev[j][2],
                     prev[j][3] + 1)
            cur[j] = min(c_sub, c_ins, c_del)
        prev = cur
    _, subs, ins, dels = prev[m]
    return WerResult(subs, ins, dels, n)


def corpus_wer(refs: Sequence[str], hyps: Sequence[str]) -> WerResult:
    """Aggregate WER over paired transcript strings (space-tokenized)."""
    total = WerResult(0, 0, 0, 0)
    for r, h in zip(refs, hyps):
        total = total + align(r.split(), h.split())
    return total
