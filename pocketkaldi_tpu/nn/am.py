"""Acoustic model: splice + DNN + prior → pseudo-log-likelihoods.

Reference: ``AcousticModel`` (src/am.{h,cc}).  ``Compute`` (am.cc:90-115)
splices ±context frames (edge-replicated, am.cc:65-88), propagates the DNN,
then per frame: floor 1e-20 → log → subtract log-prior.  The decodable adapter
then scales by the acoustic scale (decodable.cc:8-17, scale 0.1 passed at
pocketkaldi.cc:212-216) and serves per-(frame, transition-id) scores via the
tid→pdf map (decodable.cc:24-31).

TPU-native shape: one jitted function ``(..., T, D) → (..., T, num_pdfs)``;
the tid→pdf indirection is resolved once at FST-load time (per-arc pdf ids),
so the decoder gathers pdf scores directly — no per-arc scalar lookups.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Configuration
from ..errors import CorruptionError
from ..io.binary import read_vector_file
from . import layers
from .nnet import Nnet, apply_nnet

LOG_FLOOR = 1.0e-20  # am.cc:109


def splice_frames(feats: jnp.ndarray, left: int, right: int,
                  num_frames=None) -> jnp.ndarray:
    """(..., T, D) → (..., T, (left+1+right)·D) with edge replication (am.cc:65-88).

    ``num_frames`` (optional, shape = leading batch dims) gives each
    utterance's true frame count; context indices clamp at ``num_frames - 1``
    rather than the padded T, so right-padding in a bucketed batch never
    leaks into the last valid frames' right context.
    """
    t = feats.shape[-2]
    ctx = left + 1 + right
    offsets = jnp.arange(-left, right + 1)
    idx = jnp.arange(t)[:, None] + offsets[None, :]       # (T, ctx)
    if num_frames is None:
        idx = jnp.clip(idx, 0, t - 1)
        gathered = feats[..., idx, :]                     # (..., T, ctx, D)
        return gathered.reshape(*feats.shape[:-2], t, ctx * feats.shape[-1])
    last = jnp.maximum(jnp.asarray(num_frames) - 1, 0)
    idx = jnp.clip(idx, 0, last[..., None, None])         # (..., T, ctx)
    flat = idx.reshape(*idx.shape[:-2], t * ctx)          # (..., T·ctx)
    gathered = jnp.take_along_axis(feats, flat[..., None], axis=-2)
    return gathered.reshape(*feats.shape[:-2], t, ctx * feats.shape[-1])


@partial(jax.jit,
         static_argnames=("kinds", "left", "right", "acoustic_scale"))
def am_scores(feats: jnp.ndarray, kinds, params: List[layers.LayerParams],
              log_prior: jnp.ndarray, left: int, right: int,
              acoustic_scale: float = 1.0, num_frames=None) -> jnp.ndarray:
    """Spliced DNN scores: (..., T, D) → (..., T, num_pdfs).

    = acoustic_scale · (log(max(nnet(splice(x)), 1e-20)) − log_prior)

    ``num_frames`` (optional, leading-batch-shaped) bounds splice context at
    each utterance's true length in padded batches.
    """
    x = splice_frames(feats, left, right, num_frames)
    y = apply_nnet(x, kinds, params)
    y = jnp.log(jnp.maximum(y, LOG_FLOOR)) - log_prior
    return acoustic_scale * y


class AcousticModel:
    """Owns the nnet params, log-prior, context, and tid→pdf map."""

    def __init__(self, nnet: Nnet, log_prior: jnp.ndarray,
                 left_context: int, right_context: int,
                 num_pdfs: int, tid2pdf: np.ndarray):
        self.nnet = nnet
        self.log_prior = log_prior
        self.left_context = int(left_context)
        self.right_context = int(right_context)
        self.num_pdfs = int(num_pdfs)
        self.tid2pdf = np.asarray(tid2pdf, dtype=np.int32)

    @classmethod
    def read(cls, conf: Configuration) -> "AcousticModel":
        """Load from Configuration keys like AcousticModel::Read (am.cc:23-63)."""
        nnet = Nnet.read(conf.get_path("nnet"))
        prior = read_vector_file(conf.get_path("prior"))
        if np.any(prior <= 0):
            raise CorruptionError("prior contains non-positive entries")
        log_prior = jnp.asarray(np.log(prior.astype(np.float64))
                                .astype(np.float32))
        left = conf.get_integer("left_context")
        right = conf.get_integer("right_context")
        num_pdfs = conf.get_integer("num_pdfs")
        tid2pdf = read_vector_file(conf.get_path("tid2pdf"), dtype=np.int32)
        return cls(nnet, log_prior, left, right, num_pdfs, tid2pdf)

    def transition_id_to_pdf_id(self, tid: int) -> int:
        """am.h:30-32 — index the tid→pdf vector."""
        return int(self.tid2pdf[tid])

    def compute(self, feats: jnp.ndarray, acoustic_scale: float = 1.0,
                num_frames=None) -> jnp.ndarray:
        return am_scores(feats, self.nnet.kinds, self.nnet.params,
                         self.log_prior, self.left_context,
                         self.right_context, acoustic_scale, num_frames)
