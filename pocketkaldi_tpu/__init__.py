"""pocketkaldi_tpu — a TPU-native offline speech recognizer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of pocketkaldi
(reference: pcannon67/pocketkaldi): 16 kHz WAV → log-mel fbank → online CMVN →
nnet2-style DNN acoustic model → HCLG WFST Viterbi beam search → 1-best words.

Where the reference is single-threaded C++ decoding one utterance at a time,
this framework batches whole utterance sets through one compiled pipeline and
shards them across TPU meshes (``pocketkaldi_tpu.parallel``).
"""

from .config import Configuration  # noqa: F401
from .errors import (CorruptionError, NotImplementedPkError, PkError,  # noqa: F401
                     PkIOError, PkRuntimeError)
from .fst import Fst  # noqa: F401
from .hparams import CmvnOptions, DecoderOptions, FbankOptions  # noqa: F401
from .io.symbols import SymbolTable  # noqa: F401
from .recognizer import Recognizer, Utterance  # noqa: F401

__version__ = "0.1.0"
