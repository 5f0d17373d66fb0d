"""Pallas TPU kernel: greedy-parse chain walk.

The greedy LZ parse is a pointer chase pos -> pos + skip[pos]. Doubling
formulations cost O(n log n) random HBM gathers -- the slowest op class
on TPU. But the chain is *monotone increasing*, so a scalar walk only
ever moves forward: this kernel streams `skip` through VMEM in segments
(sequential DMA, full HBM bandwidth) and walks the chain inside VMEM
with one scalar load per chain node (~n total work, tiny constants).

Grid iterations run in order on TPU; the current chain position carries
across segments in SMEM scratch (accumulator pattern).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 1 << 17  # positions per segment (512 KiB of int32 in VMEM)


def _chain_kernel(skip_ref, sel_ref, pos_ref):
    s = pl.program_id(0)
    seg_start = s * SEG

    @pl.when(s == 0)
    def _():
        pos_ref[0] = 0

    sel_ref[:] = jnp.zeros_like(sel_ref)

    def cond(pos):
        return pos < seg_start + SEG

    def body(pos):
        local = pos - seg_start
        sel_ref[local] = jnp.int32(1)
        return pos + skip_ref[local]

    pos = jax.lax.while_loop(cond, body, pos_ref[0])
    pos_ref[0] = pos


@functools.partial(jax.jit, static_argnames=("n",))
def chain_select(skip: jax.Array, n: int) -> jax.Array:
    """selected[i] = 1 iff the greedy chain from 0 visits i.

    skip: int32[n] with skip[i] >= 1 (pad so n is a multiple of SEG).
    """
    assert n % SEG == 0
    grid = n // SEG
    sel = pl.pallas_call(
        _chain_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((SEG,), lambda s: (s,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SEG,), lambda s: (s,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(skip)
    return sel


def chain_select_host(skip: np.ndarray) -> np.ndarray:
    """NumPy oracle for tests."""
    n = len(skip)
    sel = np.zeros(n, np.int32)
    pos = 0
    while pos < n:
        sel[pos] = 1
        pos += int(skip[pos])
    return sel
