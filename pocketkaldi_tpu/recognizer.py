"""Recognizer orchestrator — the public API (``pk_t`` analogue).

Reference: ``pk_load`` reads a text Configuration and the 5 binary sub-models
(``src/pocketkaldi.cc:72-144``); ``pk_process`` runs WAV → fbank → CMVN →
AM → decode → words (``pocketkaldi.cc:176-248``).

TPU-native differences:

  * The whole pipeline is batched: ``process_batch`` decodes many utterances
    at once (the reference's only batching is a serial scp loop,
    main.cc:34-46).
  * Per-stage wall-times are collected with structured timers
    (utils/timing.py) rather than raw ``clock()`` prints, but the same stage
    names (Fbank, CMVN, NNET, decode) are reported for comparability.
  * Hyperparameters (beam, max_active, acoustic scale) come from the same
    Configuration file, defaulting to the reference's constants.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import Configuration
from .decoder import Hypothesis, ViterbiDecoder
from .features.cmvn import apply_cmvn
from .features.fbank import compute_fbank
from .fst import Fst
from .hparams import CmvnOptions, DecoderOptions, FbankOptions
from .io import binary, wav
from .io.symbols import SymbolTable
from .nn import AcousticModel
from .utils.timing import StageTimers


@dataclasses.dataclass
class Utterance:
    """Decoded utterance (``pk_utterance_t`` analogue, pocketkaldi.h:44-49)."""
    hyp: str
    loglikelihood_per_frame: float
    words: List[int]
    num_frames: int


class Recognizer:
    """Loads a model pack and decodes WAV/PCM utterances."""

    def __init__(self, fst: Fst, am: AcousticModel, symbols: SymbolTable,
                 cmvn_stats: np.ndarray,
                 fbank_opts: FbankOptions = FbankOptions(),
                 cmvn_opts: CmvnOptions = CmvnOptions(),
                 decoder_opts: DecoderOptions = DecoderOptions(),
                 lazy_scores_threshold: int = 4096):
        self.fst = fst
        self.am = am
        self.symbols = symbols
        self.cmvn_stats = jnp.asarray(cmvn_stats)
        self.fbank_opts = fbank_opts
        self.cmvn_opts = cmvn_opts
        self.decoder_opts = decoder_opts
        self.decoder = self._make_decoder()
        self.timers = StageTimers()
        # Utterances longer than this many frames score the AM lazily per
        # decode chunk (with splice halo) instead of materializing the whole
        # (B, T, num_pdfs) matrix — the reference materializes it whole
        # (decodable.cc:13-14), capping utterance length by memory.
        self.lazy_scores_threshold = lazy_scores_threshold

    # ------------------------------------------------------------------
    def _make_decoder(self):
        if self.decoder_opts.pooled:
            from .decoder import PooledViterbiDecoder
            return PooledViterbiDecoder(self.fst, self.am.tid2pdf,
                                        self.decoder_opts,
                                        pool_size=self.decoder_opts.pool_size)
        return ViterbiDecoder(self.fst, self.am.tid2pdf, self.decoder_opts)

    def set_decoder_opts(self, opts: DecoderOptions) -> None:
        """Swap decoder options and rebuild the decoder (graph re-blocked)."""
        self.decoder_opts = opts
        self.decoder = self._make_decoder()

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, conf_path: str, **overrides) -> "Recognizer":
        """Load all sub-models from a Configuration (pk_load, pocketkaldi.cc:72-144).

        Keys: ``fst``, ``cmvn_stats``, ``symbol_table`` plus the AM keys
        (``nnet``, ``prior``, ``left_context``, ``right_context``,
        ``num_pdfs``, ``tid2pdf``).  Optional keys promote the reference's
        hard-coded hyperparameters: ``beam``, ``max_active``,
        ``acoustic_scale``, ``chunk_frames``.
        """
        conf = Configuration.read(conf_path)
        fst = Fst.read(conf.get_path("fst"))
        cmvn_stats = binary.read_vector_file(conf.get_path("cmvn_stats"))
        am = AcousticModel.read(conf)
        symbols = SymbolTable.read(conf.get_path("symbol_table"))
        dec_defaults = DecoderOptions()
        decoder_opts = dataclasses.replace(
            dec_defaults,
            beam=conf.get_float("beam", dec_defaults.beam),
            max_active=conf.get_integer("max_active",
                                        dec_defaults.max_active),
            max_active_cap=(conf.get_integer("max_active_cap", 0) or
                            dec_defaults.max_active_cap),
            acoustic_scale=conf.get_float("acoustic_scale",
                                          dec_defaults.acoustic_scale),
            chunk_frames=conf.get_integer("chunk_frames",
                                          dec_defaults.chunk_frames),
            pooled=bool(conf.get_integer("pooled",
                                         int(dec_defaults.pooled))),
            **overrides.pop("decoder", {}))
        return cls(fst, am, symbols, cmvn_stats, decoder_opts=decoder_opts,
                   **overrides)

    # ------------------------------------------------------------------
    def process_file(self, wav_path: str) -> Utterance:
        """Decode one WAV file (pk_process analogue)."""
        samples = wav.read_16k_pcm(wav_path)
        return self.process_batch([samples])[0]

    def process_batch(self, waves: Sequence[np.ndarray],
                      bucket: Optional[int] = None) -> List[Utterance]:
        """Decode a batch of raw waves (float32, int16 scale).

        Waves are right-padded to a common bucket length so one compiled
        program serves the batch; per-utterance frame counts mask the padding
        end-to-end (frontend is causal, decoder masks padded frames).
        """
        b = len(waves)
        if b == 0:
            return []
        opts = self.fbank_opts
        lengths = [int(np.shape(w)[-1]) for w in waves]
        frame_counts = [opts.num_frames(n) for n in lengths]
        t_max = max(frame_counts)
        if t_max == 0:
            return [Utterance("", 0.0, [], 0) for _ in waves]
        pad_to = bucket or max(lengths)
        batch = np.zeros((b, pad_to), dtype=np.float32)
        for i, w in enumerate(waves):
            batch[i, :lengths[i]] = w
        # Ship int16 when the waves are exactly 16-bit PCM (the usual case:
        # they came off disk as int16): halves the host->device bytes on a
        # link where a large pooled-decode program degrades transfer to
        # ~25 MB/s (docs/PERFORMANCE.md r3 sync-overhead note).  int16 ->
        # float32 is exact, so results are bit-identical.
        if batch.nbytes > (1 << 21) and np.all(np.isfinite(batch)) \
                and np.all(np.abs(batch) <= 32767):
            as_i16 = batch.astype(np.int16)
            if np.array_equal(as_i16, batch):
                batch = as_i16

        with self.timers.stage("Fbank"):
            feats = compute_fbank(jnp.asarray(batch), opts.num_frames(pad_to),
                                  opts)
            feats.block_until_ready()
        with self.timers.stage("CMVN"):
            feats = apply_cmvn(feats, self.cmvn_stats, self.cmvn_opts)
            feats.block_until_ready()
        t_padded = feats.shape[1]
        nf = jnp.asarray(frame_counts, dtype=jnp.int32)
        if t_padded <= self.lazy_scores_threshold:
            with self.timers.stage("NNET"):
                scores = self.am.compute(
                    feats, acoustic_scale=self.decoder_opts.acoustic_scale,
                    num_frames=nf)
                scores.block_until_ready()
            with self.timers.stage("decode"):
                hyps = self.decoder.decode(scores, num_frames=frame_counts)
        else:
            scores_fn = self._lazy_scorer(feats, nf)
            with self.timers.stage("decode"):
                hyps = self.decoder.decode(scores_fn,
                                           num_frames=frame_counts)

        return [self._format(h) for h in hyps]

    def _lazy_scorer(self, feats, num_frames):
        """Per-chunk AM scoring with splice halo — O(chunk) score memory.

        Every chunk scores a fixed-width feature window so a single compiled
        program serves all chunks; the halo means spliced context at chunk
        boundaries sees real neighbor frames, and the per-utterance
        ``num_frames`` clamp keeps end-of-utterance edge replication exact.
        """
        left, right = self.am.left_context, self.am.right_context
        chunk = self.decoder_opts.chunk_frames
        window = chunk + left + right
        t_padded = feats.shape[1]
        if t_padded < window:
            feats = jnp.pad(feats, ((0, 0), (0, window - t_padded), (0, 0)))
            t_padded = window
        scale = self.decoder_opts.acoustic_scale

        def scores_fn(lo, hi):
            start = int(np.clip(lo - left, 0, t_padded - window))
            sub = jax.lax.dynamic_slice_in_dim(feats, start, window, axis=1)
            sub_scores = self.am.compute(
                sub, acoustic_scale=scale,
                num_frames=jnp.maximum(num_frames - start, 0))
            return sub_scores[:, lo - start:hi - start]

        return scores_fn

    # ------------------------------------------------------------------
    def _format(self, hyp: Hypothesis) -> Utterance:
        """Word ids → text (pocketkaldi.cc:225-243)."""
        if hyp.empty:
            return Utterance("", 0.0, [], hyp.num_frames)
        text = " ".join(self.symbols.get(w) for w in hyp.words)
        loglike = hyp.weight / max(hyp.num_frames, 1)
        return Utterance(text, loglike, list(hyp.words), hyp.num_frames)
