"""Pure-numpy differential oracles for the NN stack and the Viterbi decoder.

Independent re-implementations of the reference semantics (src/nnet.cc,
src/am.cc, src/decoder.cc) used as executable specs in tests.  The decoder
oracle is an *exhaustive* Viterbi over all states (no pruning), so for small
graphs it is exact ground truth for the 1-best path, cost, and word sequence.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# NN oracle (nnet.cc semantics)
# ---------------------------------------------------------------------------

def nnet_forward_np(x: np.ndarray, spec) -> np.ndarray:
    from pocketkaldi_tpu.io import binary
    x = x.astype(np.float64)
    for layer in spec.layers:
        if layer.kind == binary.LAYER_LINEAR:
            x = x @ layer.weight.T.astype(np.float64) + layer.bias
        elif layer.kind == binary.LAYER_RELU:
            x = np.maximum(x, 0.0)
        elif layer.kind == binary.LAYER_NORMALIZE:
            d = x.shape[-1]
            x = x * np.sqrt(d / np.sum(x * x, axis=-1, keepdims=True))
        elif layer.kind == binary.LAYER_SOFTMAX:
            e = np.exp(x - x.max(axis=-1, keepdims=True))
            x = e / e.sum(axis=-1, keepdims=True)
        elif layer.kind == binary.LAYER_MUL:
            x = x * layer.vec
        elif layer.kind == binary.LAYER_ADD:
            x = x + layer.scale * layer.vec
        else:
            raise ValueError(layer.kind)
    return x


def splice_np(feats: np.ndarray, left: int, right: int) -> np.ndarray:
    t = feats.shape[0]
    cols = []
    for off in range(-left, right + 1):
        idx = np.clip(np.arange(t) + off, 0, t - 1)
        cols.append(feats[idx])
    return np.concatenate(cols, axis=-1)


def am_scores_np(feats: np.ndarray, spec, prior: np.ndarray, left: int,
                 right: int, acoustic_scale: float = 1.0) -> np.ndarray:
    y = nnet_forward_np(splice_np(feats, left, right), spec)
    y = np.log(np.maximum(y, 1.0e-20)) - np.log(prior.astype(np.float64))
    return acoustic_scale * y


# ---------------------------------------------------------------------------
# Decoder oracle: exhaustive Viterbi with epsilon closure
# ---------------------------------------------------------------------------

def viterbi_oracle(fst, tid2pdf: np.ndarray, scores: np.ndarray
                   ) -> Tuple[List[int], float]:
    """Exact 1-best (words, cost+final) through the graph.

    scores: (T, num_pdfs) acoustic-scaled log-likelihoods.  Mirrors the
    reference control flow (InitDecoding → per frame ProcessEmitting +
    ProcessNonemitting → BestPath) but with no beam/max-active pruning, so it
    is ground truth.
    """
    # state -> (cost, words-tuple)
    beam: Dict[int, Tuple[float, Tuple[int, ...]]] = {
        int(fst.start_state): (0.0, ())}
    beam = _eps_closure(fst, beam)
    t_total = scores.shape[0]
    for t in range(t_total):
        new: Dict[int, Tuple[float, Tuple[int, ...]]] = {}
        for state, (cost, words) in beam.items():
            for dst, il, ol, w in fst.arcs_of(state):
                if il == 0:
                    continue
                c = cost + w - float(scores[t, int(tid2pdf[il])])
                nw = words + (ol,) if ol != 0 else words
                if dst not in new or c < new[dst][0]:
                    new[dst] = (c, nw)
        beam = _eps_closure(fst, new)
    best_cost = math.inf
    best_words: List[int] = []
    found = False
    for state, (cost, words) in beam.items():
        fin = float(fst.final[state])
        if math.isinf(fin):
            continue
        if cost + fin < best_cost:
            best_cost = cost + fin
            best_words = list(words)
            found = True
    if not found:
        return [], math.inf
    return best_words, best_cost


def _eps_closure(fst, beam):
    """Work-list epsilon relaxation (decoder.cc:186-221 semantics)."""
    queue = list(beam.keys())
    while queue:
        state = queue.pop()
        cost, words = beam[state]
        for dst, il, ol, w in fst.arcs_of(state):
            if il != 0:
                continue
            c = cost + w
            nw = words + (ol,) if ol != 0 else words
            if dst not in beam or beam[dst][0] > c:
                beam[dst] = (c, nw)
                queue.append(dst)
    return beam
