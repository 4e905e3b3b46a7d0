"""Sharded end-to-end pipeline: waves → words, pjit over a device mesh.

Parallelism mapping (net-new vs the reference, SURVEY.md §2.5/§5.8):

  * data parallel   — utterance batch sharded over the ``data`` mesh axis;
                      every stage (fbank, CMVN, AM, decode) is element-wise in
                      the batch, so XLA partitions it with zero communication.
  * tensor parallel — nnet Linear layers alternately shard their output/input
                      feature dim over the ``model`` axis; XLA inserts the
                      all-reduce (psum) between them (GSPMD).
  * sequence para.  — the fbank frontend is frame-parallel by construction;
                      frames of one utterance can additionally split over
                      ``model`` when utterances are long (sharding the frame
                      axis of the frontend tensors).

The decoding graph and model are replicated (HCLG at this scale fits per
device); only utterance data and beam state are sharded — the layout chosen
in SURVEY.md §5.8.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..decoder.beam import (Beam, GraphArrays, best_final, frame_step,
                            init_beam)
from ..features.cmvn import apply_cmvn
from ..features.fbank import fbank_from_frames, frame_signal, process_frames
from ..hparams import CmvnOptions, DecoderOptions, FbankOptions
from ..io.binary import LAYER_LINEAR
from ..nn.am import LOG_FLOOR, splice_frames
from ..nn.nnet import apply_nnet
from .mesh import DATA_AXIS, MODEL_AXIS, replicated


def shard_nnet_params(kinds, params: List[dict], mesh) -> List[dict]:
    """Tensor-parallel placement: alternate Linear layers shard out/in dims.

    Layer 2k: W (in, out) → P(None, 'model'), b → P('model')
    Layer 2k+1: W → P('model', None), b → replicated
    XLA inserts the psum after each in-dim-sharded matmul.
    """
    out = []
    linear_idx = 0
    for kind, p in zip(kinds, params):
        if kind != LAYER_LINEAR:
            out.append(jax.device_put(p, replicated(mesh)))
            continue
        if linear_idx % 2 == 0:
            w_s = NamedSharding(mesh, P(None, MODEL_AXIS))
            b_s = NamedSharding(mesh, P(MODEL_AXIS))
        else:
            w_s = NamedSharding(mesh, P(MODEL_AXIS, None))
            b_s = replicated(mesh)
        out.append({"w": jax.device_put(p["w"], w_s),
                    "b": jax.device_put(p["b"], b_s)})
        linear_idx += 1
    return out


class ShardedPipeline:
    """One compiled sharded step covering the full recognizer pipeline.

    ``step(waves, wave_lengths)`` returns (records, init record, beam, best
    slot/cost/final) — everything the host traceback needs.  Designed for the
    multi-chip dry-run and for single-program batched decoding where the
    utterance length bound is moderate (long audio uses the chunked driver in
    ``decoder/decoder.py``).
    """

    def __init__(self, mesh, graph: GraphArrays, kinds, nnet_params,
                 log_prior, cmvn_stats, left: int, right: int,
                 fbank_opts: FbankOptions = FbankOptions(),
                 cmvn_opts: CmvnOptions = CmvnOptions(),
                 decoder_opts: DecoderOptions = DecoderOptions(),
                 num_eps_iters: int = 2):
        self.mesh = mesh
        self.graph = graph
        self.kinds = kinds
        self.nnet_params = shard_nnet_params(kinds, nnet_params, mesh)
        self.log_prior = jax.device_put(log_prior, replicated(mesh))
        self.cmvn_stats = jax.device_put(cmvn_stats, replicated(mesh))
        self.left = left
        self.right = right
        self.fbank_opts = fbank_opts
        self.cmvn_opts = cmvn_opts
        self.decoder_opts = decoder_opts
        self.num_eps_iters = num_eps_iters

        data1 = NamedSharding(mesh, P(DATA_AXIS))
        data2 = NamedSharding(mesh, P(DATA_AXIS, None))
        self._step = jax.jit(
            self._pipeline,
            static_argnums=(2,),
            in_shardings=(data2, data1),
            )

    # ------------------------------------------------------------------
    def _pipeline(self, waves: jnp.ndarray, num_frames: jnp.ndarray,
                  num_frames_padded: int):
        """waves (B, N) + per-utterance frame counts → decode outputs."""
        opts = self.fbank_opts
        frames = frame_signal(waves, num_frames_padded, opts)
        frames = process_frames(frames, opts)
        feats = fbank_from_frames(frames, opts)
        feats = apply_cmvn(feats, self.cmvn_stats, self.cmvn_opts)
        x = splice_frames(feats, self.left, self.right, num_frames)
        y = apply_nnet(x, self.kinds, self.nnet_params)
        scores = self.decoder_opts.acoustic_scale * (
            jnp.log(jnp.maximum(y, LOG_FLOOR)) - self.log_prior)

        b = waves.shape[0]
        dec = partial(frame_step, g=self.graph, opts=self.decoder_opts,
                      num_eps_iters=self.num_eps_iters)

        beam, init_rec = init_beam(b, self.graph, self.decoder_opts,
                                   self.num_eps_iters)

        frame_idx = jnp.arange(num_frames_padded)
        valid = frame_idx[None, :] < num_frames[:, None]

        def body(bm, xs):
            s_t, v_t = xs
            b2, rec, ov = dec(bm, s_t, v_t)
            return b2, (rec, ov)

        beam, (recs, ovs) = jax.lax.scan(
            body, beam, (jnp.swapaxes(scores, 0, 1), valid.T))
        slot, total, fin = best_final(beam, self.graph)
        return recs, init_rec, beam, (slot, total, fin)

    # ------------------------------------------------------------------
    def step(self, waves: np.ndarray, wave_lengths: np.ndarray):
        """Run the compiled sharded pipeline; returns device outputs."""
        opts = self.fbank_opts
        num_frames = np.array([opts.num_frames(int(n))
                               for n in wave_lengths], dtype=np.int32)
        padded_t = opts.num_frames(waves.shape[1])
        return self._step(jnp.asarray(waves), jnp.asarray(num_frames),
                          padded_t)
