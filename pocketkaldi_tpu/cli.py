"""Command-line interface.

Mirrors the reference CLI contract (``src/main.cc:57-80``):

    python -m pocketkaldi_tpu <model-conf> <input>

    input *.wav — decode this file
    input *.scp — newline list of wav paths, decoded as a single batch

Output format per utterance is identical to the reference
(``main.cc:28``): ``filename\thyp\tavg_loglikelihood_per_frame``.

The TPU-native win over the reference's serial scp loop (main.cc:34-46): an
scp is decoded as one padded batch through a single compiled pipeline.
"""

from __future__ import annotations

import sys

from .io import wav
from .recognizer import Recognizer


def print_usage() -> None:
    print("Usage: python -m pocketkaldi_tpu <model-file> <input-file>")
    print("  Input-file:")
    print("    *.wav: decode this file.")
    print("    *.scp: decode audios listed in it (as one batch).")
    sys.exit(1)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print_usage()
    model_file, input_file = argv
    if len(input_file) < 4:
        print_usage()

    recognizer = Recognizer.load(model_file)

    if input_file.endswith(".wav"):
        filenames = [input_file]
    else:
        with open(input_file) as fd:
            filenames = [line.strip() for line in fd if line.strip()]

    waves = [wav.read_16k_pcm(f) for f in filenames]
    if len(waves) > 1:
        from .parallel.bucketing import decode_bucketed
        utts = decode_bucketed(recognizer, waves)
    else:
        utts = recognizer.process_batch(waves)
    for fname, utt in zip(filenames, utts):
        print(f"{fname}\t{utt.hyp}\t{utt.loglikelihood_per_frame:f}")
    print(recognizer.timers.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
