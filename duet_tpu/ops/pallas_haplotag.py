"""K1 (Pallas) — haplotag scoring with a fused epilogue, tiled for VMEM/MXU.

The jnp path (duet_tpu.ops.haplotag) leaves epilogue fusion to XLA; this
kernel makes the schedule explicit: a grid over read tiles keeps one
(TILE_R x S) slab of the quality-weighted allele matrix in VMEM, MXU
matmuls against the packed (S x K) right-hand side produce
[signed | total | per-block weights] in a single pass, and the epilogue —
haplotype sign, PC cost clip, best-block argmax — runs on the VPU before
anything returns to HBM.  Results leave the kernel as one lane-aligned
(R, 128) int32 tile holding [hap | pc | best_block] columns; no (R x K)
float intermediate ever materializes in HBM.

K (= 2 + n_blocks) is padded to the 128-lane boundary so the bf16 tiles
hit the MXU's native (x, 128) shape.

Used by bench.py for the speed-of-light comparison against the XLA-fused
path; pinned equal to ops.haplotag in tests (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from duet_tpu.ops.haplotag import PC_MAX, PC_PER_MARGIN

TILE_R = 256
LANES = 128


def _kernel(n_blocks: int, aw_ref, abs_ref, rhs_ref, out_ref):
    aw = aw_ref[:]
    rhs = rhs_ref[:]
    signed_cols = jax.lax.dot_general(
        aw, rhs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    abs_cols = jax.lax.dot_general(
        abs_ref[:], rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    signed = signed_cols[:, 0]
    total = abs_cols[:, 1]
    blockw = abs_cols[:, 2:]

    tagged = (total > 0) & (signed != 0)
    hap = jnp.where(tagged, jnp.where(signed > 0, 1, 2), 0).astype(jnp.int32)
    pc = jnp.clip(jnp.rint(PC_PER_MARGIN * jnp.abs(signed)), 1, PC_MAX)
    pc = jnp.where(tagged, pc.astype(jnp.int32), -1)
    col = jax.lax.broadcasted_iota(jnp.int32, blockw.shape, 1)
    best = jnp.argmax(
        jnp.where(col < n_blocks, blockw, -jnp.inf), axis=1
    ).astype(jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (aw.shape[0], LANES), 1)
    packed = jnp.where(lane == 0, hap[:, None],
                       jnp.where(lane == 1, pc[:, None],
                                 jnp.where(lane == 2, best[:, None], 0)))
    out_ref[:] = packed


@functools.partial(jax.jit, static_argnames=("interpret",))
def haplotag_score_pallas(alleles, weights, phase, block_onehot,
                          interpret: bool = False):
    """Fused scoring over (R, S) dense windows.

    alleles int8, weights float32, phase float32 (+1/-1/0),
    block_onehot float32 (S, B).  Returns (hap, pc, best_block) — identical
    to the final-scoring outputs of ops.haplotag.phase_and_tag.
    """
    R, S = alleles.shape
    B = block_onehot.shape[1]
    K = 2 + B
    K_pad = ((K + LANES - 1) // LANES) * LANES
    R_pad = ((R + TILE_R - 1) // TILE_R) * TILE_R

    aw = (alleles.astype(jnp.bfloat16) * weights.astype(jnp.bfloat16))
    abs_aw = jnp.abs(aw)
    if R_pad != R:
        pad = ((0, R_pad - R), (0, 0))
        aw = jnp.pad(aw, pad)
        abs_aw = jnp.pad(abs_aw, pad)

    informative = (phase != 0).astype(jnp.bfloat16)
    rhs = jnp.zeros((S, K_pad), jnp.bfloat16)
    rhs = rhs.at[:, 0].set(phase.astype(jnp.bfloat16))
    rhs = rhs.at[:, 1].set(informative)
    rhs = rhs.at[:, 2:2 + B].set(block_onehot.astype(jnp.bfloat16))

    grid = (R_pad // TILE_R,)
    packed = pl.pallas_call(
        functools.partial(_kernel, B),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, LANES), jnp.int32),
        interpret=interpret,
    )(aw, abs_aw, rhs)
    return packed[:R, 0], packed[:R, 1], packed[:R, 2]
