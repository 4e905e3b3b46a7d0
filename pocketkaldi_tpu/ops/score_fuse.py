"""Pallas TPU kernel: fused candidate scoring for the decoder frame step.

Computes, for every candidate arc of one frame,

    cand_cost[n] = tok_cost[n] + weight[n] - scores[pdf[n]]

in one pass.  This fuses the decoder's acoustic-score lookup
(``beam.lookup_scores``) with the cost accumulation that XLA otherwise runs
as separate HBM-bound elementwise ops.  The reference performs the same
lookup one arc at a time inside its token loop
(``src/decoder.cc:268-273`` → ``src/decodable.cc:24-31``); here ~500k
candidates per frame are scored per batch in a few microseconds of MXU time.

Why a kernel: ``scores[pdf]`` is a dynamic gather, which XLA:TPU serializes
(~13 ns/index).  The factorized one-hot matmul (beam.lookup_scores) fixes
the latency but materializes its (N, 128) one-hot through HBM.  Here the
one-hot lives only in VMEM: per 2048-candidate tile, build the column
one-hot, hit the MXU against the (128, R) score table resident in VMEM, and
mask-reduce the row factor — no HBM traffic beyond reading pdf/weight/
tok_cost and writing cand_cost.

Exactness: each dot product has exactly one nonzero term (1.0 * score), so
f32 accumulation introduces no rounding — same argument as
beam.lookup_scores, enforced with ``preferred_element_type=f32`` (the MXU
would otherwise truncate inputs to bf16).

The kernel is optional: ``available()`` probes a tiny compile at first use
and the decoder falls back to the XLA path when Mosaic refuses (older
toolchains / non-TPU backends).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Tile: SUB x 128 candidates per grid step (SUB=16 -> 2048 candidates).
SUB = 16
LANE = 128


def _kernel(scores_ref, pdf_ref, weight_ref, tok_cost_ref, out_ref):
    """One (SUB, LANE) candidate tile against the full (R, LANE) table.

    Block shapes carry a leading size-1 batch dim (grid axis 0)."""
    r = scores_ref.shape[1]
    n = SUB * LANE

    pdf = pdf_ref[0].reshape(n, 1)                      # flat candidates
    col = jax.lax.rem(pdf, LANE)
    row = jax.lax.div(pdf, LANE)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (n, LANE), 1)
    oh_col = (lane_ids == col).astype(jnp.float32)      # (n, LANE) in VMEM
    # (n, LANE) @ (LANE, R) — table transposed so the contraction is lane-major
    t1 = jax.lax.dot_general(
        oh_col, scores_ref[0].T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (n, R)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
    looked = jnp.sum(jnp.where(row_ids == row, t1, 0.0), axis=1)

    out_ref[0] = (tok_cost_ref[0] + weight_ref[0]
                  - looked.reshape(SUB, LANE))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cand_cost(scores: jnp.ndarray, pdf: jnp.ndarray,
                    weight: jnp.ndarray, tok_cost: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """cand_cost = tok_cost + weight - scores[pdf], batched.

    scores:   (B, P) f32 frame scores (already acoustic-scaled)
    pdf:      (B, N) int32 candidate pdf ids, 0 <= pdf < P (pad lanes must
              carry a valid index; their weight is +inf so the result is +inf)
    weight:   (B, N) f32 arc weights
    tok_cost: (B, N) f32 per-candidate token base cost
    returns:  (B, N) f32

    N must be a multiple of SUB*LANE (the decoder's candidate count K*mb*block
    always is for power-of-two K); P is padded to a multiple of LANE here.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, p = scores.shape
    n = pdf.shape[-1]
    tile = SUB * LANE
    if n % tile != 0:
        raise ValueError(f"N={n} not a multiple of {tile}")
    r = -(-p // LANE)
    table = jnp.pad(scores, ((0, 0), (0, r * LANE - p)))
    table = table.reshape(b, r, LANE)

    grid = (b, n // tile)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, LANE), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n // LANE, LANE), jnp.float32),
        interpret=interpret,
    )(table, pdf.reshape(b, n // LANE, LANE),
      weight.reshape(b, n // LANE, LANE),
      tok_cost.reshape(b, n // LANE, LANE)).reshape(b, n)


_AVAILABLE = {}


def available(width: int = SUB * LANE, num_scores: int = LANE) -> bool:
    """Probe-compile the kernel at the CALLER'S shape family; False when
    Mosaic/backend refuses.

    The tunneled-TPU Mosaic service rejected some fused kernels in earlier
    rounds (HTTP 500, docs/PERFORMANCE.md) and acceptance can depend on the
    block geometry, so the probe runs with the caller's (width, table-rows)
    — a tiny-shape probe passing while the real shape crashes the compile
    would take down the whole chunk program (the kernel sits inside a
    scanned jit).  One probe compile per shape family, cached.
    """
    key = (int(width), -(-int(num_scores) // LANE))
    if key not in _AVAILABLE:
        try:
            if jax.default_backend() != "tpu":
                _AVAILABLE[key] = False
            else:
                s = jnp.zeros((1, num_scores), jnp.float32)
                z = jnp.zeros((1, width), jnp.float32)
                i = jnp.zeros((1, width), jnp.int32)
                fused_cand_cost(s, i, z, z).block_until_ready()
                _AVAILABLE[key] = True
        except Exception:   # noqa: BLE001 — any compile/runtime refusal
            _AVAILABLE[key] = False
    return _AVAILABLE[key]


def reference_cand_cost(scores, pdf, weight, tok_cost):
    """Oracle for tests: plain gather formulation."""
    return tok_cost + weight - jnp.take_along_axis(scores, pdf, axis=-1)
