"""DNN layer kernels (functional, jit-friendly).

Reference: ``src/nnet.cc`` — a sequential stack over a frames×dims matrix.
Layer semantics reproduced exactly:

  * Linear     y = x·Wᵀ + b  with W stored (out, in); the reference
               pre-transposes at load (nnet.cc:16-17) and runs its blocked
               AVX2 GEMM — here the MXU does it via one ``jnp.dot``.
  * ReLU       max(x, 0)                       (nnet.cc:49-60)
  * Softmax    per-row, max-subtracted          (vector.cc ApplySoftMax)
  * Normalize  x · sqrt(D / Σx²) per row        (nnet.cc:62-75)
  * Mul        x · v  — declared (nnet.h:19) and emitted by the converter for
               Kaldi FixedScaleComponent (tool/convert_am.py:213-217) but left
               unimplemented in the reference loader (nnet.cc:106-127);
               implemented here.
  * Add        x + scale·v — same status as Mul (format per
               tool/convert_am.py:93-97).

Parameters are plain pytrees so the whole stack jits, vmaps, and shards.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import CorruptionError
from ..io.binary import (LAYER_ADD, LAYER_LINEAR, LAYER_MUL, LAYER_NORMALIZE,
                         LAYER_RELU, LAYER_SOFTMAX, NnetSpec)

LayerParams = Dict[str, Any]


def linear(x: jnp.ndarray, params: LayerParams) -> jnp.ndarray:
    # params["w"]: (in, out) — transposed once at load like nnet.cc:16-17.
    # HIGHEST precision matches the reference's full-f32 GEMM
    # (gemm_haswell.cc); model matmuls are small enough that the extra MXU
    # passes are cheap.  A bf16 fast path can relax this per-model later.
    y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return y + params["b"]


def relu(x: jnp.ndarray, params: LayerParams) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


def softmax(x: jnp.ndarray, params: LayerParams) -> jnp.ndarray:
    # ApplySoftMax subtracts the row max before exponentiation (vector.cc:264-277)
    shifted = x - jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(shifted)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def normalize(x: jnp.ndarray, params: LayerParams) -> jnp.ndarray:
    d = x.shape[-1]
    squared_sum = jnp.sum(x * x, axis=-1, keepdims=True)
    scale = jnp.sqrt(d / squared_sum)
    return x * scale


def mul(x: jnp.ndarray, params: LayerParams) -> jnp.ndarray:
    return x * params["v"]


def add(x: jnp.ndarray, params: LayerParams) -> jnp.ndarray:
    return x + params["scale"] * params["v"]


_KERNELS = {
    LAYER_LINEAR: linear,
    LAYER_RELU: relu,
    LAYER_SOFTMAX: softmax,
    LAYER_NORMALIZE: normalize,
    LAYER_MUL: mul,
    LAYER_ADD: add,
}


def params_from_spec(spec: NnetSpec):
    """Convert a parsed ``NnetSpec`` into (kinds, params).

    ``kinds`` is a static tuple of layer-type ids (part of the jit trace
    structure); ``params`` is the traced pytree of arrays.
    """
    kinds = []
    out: List[LayerParams] = []
    for layer in spec.layers:
        p: LayerParams = {}
        if layer.kind == LAYER_LINEAR:
            p["w"] = jnp.asarray(np.ascontiguousarray(layer.weight.T,
                                                      dtype=np.float32))
            p["b"] = jnp.asarray(layer.bias.astype(np.float32))
        elif layer.kind == LAYER_MUL:
            p["v"] = jnp.asarray(layer.vec.astype(np.float32))
        elif layer.kind == LAYER_ADD:
            p["v"] = jnp.asarray(layer.vec.astype(np.float32))
            p["scale"] = jnp.float32(layer.scale)
        elif layer.kind not in _KERNELS:
            raise CorruptionError(f"unexpected layer type: {layer.kind}")
        kinds.append(layer.kind)
        out.append(p)
    return tuple(kinds), out


def apply_layer(x: jnp.ndarray, kind: int, params: LayerParams) -> jnp.ndarray:
    return _KERNELS[kind](x, params)
