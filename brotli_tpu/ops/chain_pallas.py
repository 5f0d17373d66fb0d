"""Pallas TPU kernel: greedy-parse chain walk.

The greedy LZ parse is a pointer chase pos -> pos + skip[pos]. Doubling
formulations cost O(n log n) random HBM gathers -- the slowest op class
on TPU. But the chain is *monotone increasing*, so a scalar walk only
ever moves forward: this kernel streams `skip` through VMEM in segments
(sequential DMA, full HBM bandwidth) and walks the chain inside VMEM
with one scalar load per chain node.

Mosaic forbids scalar stores to VMEM, so match emissions are one-hot
row OR-writes into a (SEG/128, 128) selection tile; literal hops
(skip == 1) emit nothing. Grid iterations run in order on TPU; the
chain position carries across segments in SMEM scratch.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 1 << 14  # positions per segment (64 KiB of int32 in SMEM)
LANES = 128


def _chain_kernel(start_ref, skip_ref, sel_ref, pos_ref):
    s = pl.program_id(0)
    seg_start = s * SEG

    @pl.when(s == 0)
    def _():
        pos_ref[0] = start_ref[0]

    sel_ref[:, :] = jnp.zeros_like(sel_ref)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)[0]

    def cond(pos):
        return pos < seg_start + SEG

    def body(pos):
        local = pos - seg_start
        sk = skip_ref[local]

        @pl.when(sk > 1)  # match node: mark it
        def _():
            row = local // LANES
            lane = local % LANES
            sel_ref[row, :] = sel_ref[row, :] | \
                (lane_ids == lane).astype(jnp.int32)

        return pos + sk

    pos = jax.lax.while_loop(cond, body, pos_ref[0])
    pos_ref[0] = pos


@functools.partial(jax.jit, static_argnames=("n",))
def chain_select(skip: jax.Array, n: int, start=0) -> jax.Array:
    """selected[i] = 1 iff the greedy chain from `start` takes the
    match at i (i.e. visits i and skip[i] > 1).

    skip: int32[n] with skip[i] >= 1; n must be a multiple of SEG.
    Returns int32[n//128, 128] tile mask (flatten to get per-position).
    """
    assert n % SEG == 0
    grid = n // SEG
    start_arr = jnp.asarray(start, jnp.int32).reshape(1)
    sel = pl.pallas_call(
        _chain_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((SEG,), lambda s: (s,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((SEG // LANES, LANES), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(start_arr, skip)
    return sel.reshape(n)


def chain_select_xla(skip: jax.Array, n: int, start=0) -> jax.Array:
    """Pure-XLA chain walk (lax.while_loop) for backends without
    Mosaic (CPU tests, dry runs). Same contract as chain_select."""
    sel = jnp.zeros(n, jnp.int32)

    def cond(state):
        return state[0] < n

    def body(state):
        pos, sel = state
        sk = skip[pos]
        sel = sel.at[pos].set(jnp.where(sk > 1, 1, 0))
        return pos + jnp.maximum(sk, 1), sel

    _, sel = jax.lax.while_loop(cond, body,
                                (jnp.asarray(start, jnp.int32), sel))
    return sel


def chain_select_host(skip: np.ndarray) -> np.ndarray:
    """NumPy oracle for tests (match nodes only)."""
    n = len(skip)
    sel = np.zeros(n, np.int32)
    pos = 0
    while pos < n:
        sk = int(skip[pos])
        if sk > 1:
            sel[pos] = 1
        pos += sk
    return sel
