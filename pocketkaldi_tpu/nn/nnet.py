"""Sequential DNN inference (``Nnet`` analogue, src/nnet.{h,cc}).

The reference propagates a whole utterance as one frames×dims matrix through
the layer stack (``Nnet::Propagate``, nnet.cc:149-163), transposing in and out
of its column-major C matrices.  Here the stack is a pure function over
``(..., T, D)`` arrays — batching over utterances is just another leading
axis, and the matmuls land on the MXU.

Layer-type ids are static (they select kernels at trace time); the parameter
arrays are the traced pytree.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ..io.binary import NnetSpec, read_nnet_file
from . import layers


class Nnet:
    def __init__(self, kinds: Tuple[int, ...],
                 params: List[layers.LayerParams]):
        self.kinds = kinds
        self.params = params

    @classmethod
    def read(cls, filename: str) -> "Nnet":
        return cls(*layers.params_from_spec(read_nnet_file(filename)))

    @classmethod
    def from_spec(cls, spec: NnetSpec) -> "Nnet":
        return cls(*layers.params_from_spec(spec))

    @property
    def num_layers(self) -> int:
        return len(self.kinds)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return apply_nnet(x, self.kinds, self.params)


def apply_nnet(x: jnp.ndarray, kinds: Tuple[int, ...],
               params: List[layers.LayerParams]) -> jnp.ndarray:
    """Propagate (..., T, in_dim) → (..., T, out_dim); pure / jit-safe."""
    for kind, p in zip(kinds, params):
        x = layers.apply_layer(x, kind, p)
    return x
