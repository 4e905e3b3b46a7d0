"""Kaldi-CLI-compatible fbank feature dumper.

Mirrors the reference's parity tool ``tool/compute_fbank.cc`` (which links
real Kaldi and is stale against its own tree — SURVEY.md §2.2): reads an scp
of `utt-id wav-path` pairs (or bare wav paths), computes log-mel fbank
features, and writes a Kaldi *text* archive (``utt  [ row ... row ]``) for
float-diffing against ``compute-fbank-feats`` output.

Usage:
    python -m pocketkaldi_tpu.tools.compute_fbank <wav.scp> <out.ark.txt>
"""

from __future__ import annotations

import sys

from ..features.fbank import FbankOptions, compute_fbank_np
from ..io import wav


def dump_fbank_ark(scp_path: str, out_path: str,
                   opts: FbankOptions = FbankOptions()) -> int:
    entries = []
    with open(scp_path) as fd:
        for line in fd:
            parts = line.split()
            if not parts:
                continue
            if len(parts) == 1:
                entries.append((parts[0], parts[0]))
            else:
                entries.append((parts[0], parts[1]))
    with open(out_path, "w") as out:
        for utt_id, path in entries:
            feats = compute_fbank_np(wav.read_16k_pcm(path), opts)
            out.write(f"{utt_id}  [\n")
            for i, row in enumerate(feats):
                vals = " ".join(f"{v:.7g}" for v in row)
                tail = " ]" if i == len(feats) - 1 else ""
                out.write(f"  {vals}{tail}\n")
            if len(feats) == 0:
                out.write("  ]\n")
    return len(entries)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 1
    n = dump_fbank_ark(argv[0], argv[1])
    print(f"wrote {n} utterances to {argv[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
