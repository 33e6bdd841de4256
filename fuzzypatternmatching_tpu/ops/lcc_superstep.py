"""Pallas fused LCC-superstep kernels (the north-star "segment-gather"
kernel; reference hot loop: label_propagation_pattern_matching_nonunique_ee
.hpp:552-624 fan-out + 829-1027 verify).

The superstep's cost on one chip is two RANDOM gathers per edge slot
(CLAUDE.md: ~700-850 ms each at s21 through XLA):

  * ``tv[adj]`` — the sender's candidate bitset, a random read into a
    V-sized table, and
  * ``alive[rev]`` — the sender-side edge-alive flag, a random read into an
    S-sized flag array.

Both tables fit in v5e VMEM at the s21 benchmark scale once shrunk to their
information content — tv is uint16 (16-vertex template cap), the alive
flags bit-pack to S/8 bytes — so the fused kernels here pin the TABLE in
VMEM and stream the (large, sequential) index arrays through it, turning
HBM transaction-bound gathers into VMEM reads:

  * ``rev_alive_lookup``: alive_bits (packed uint32 words, VMEM) gathered
    at ``rev`` per slot → bool.
  * ``gather_accept_or``: tv table (uint16, VMEM) gathered at ``adj``,
    masked by the alive/rev flags, accept-tested against the row's
    pattern-adjacency mask, OR-reduced along the row → per-row
    ``template_neighbors`` partials, plus the accept and send_ok slot
    masks the caller needs for edge elimination and message counts.

Row tiles are streamed by the Pallas grid; the tables use full-array
BlockSpecs (resident for the whole call). ``interpret=True`` runs the same
kernels on CPU for the conformance tests; whether Mosaic supports the
dynamic VMEM gather on a real chip is probed at runtime by
``pallas_supported()`` and measured end-to-end by the A/B bench
(tools/pallas_ab_bench.py).

MEASURED RESULT (round 2, v5e via the axon relay — BENCH_PALLAS_AB.json):
Mosaic rejects the table gather with "Cannot do int indexing on TPU", so
``pallas_supported() == False`` and the engine stays on the XLA path
(3.20 s end-to-end at s21). Probing shows Mosaic DOES lower
``jnp.take_along_axis`` on either the lane or the sublane axis — but an
arbitrary flat-index table gather needs table[row(q), lane(q)] with BOTH
coordinates data-dependent, which the two single-axis forms cannot
compose to directly. Future paths, in expected-payoff order: (a)
locality-aware vertex reordering (BFS/community order) so the XLA gather
becomes cache-friendly; (b) a radix-style two-pass static permutation
(sender-sorted -> receiver-sorted) replacing the random gather with
streaming passes; (c) a two-level take_along_axis gather after grouping
slots by ``lane(q)`` at construction time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_rows(n: int, w: int, budget: int = 1 << 16) -> int:
    """Rows per grid step: keep TILE*w around the element budget."""
    t = max(1, budget // max(w, 1))
    # power-of-two tile that divides padded n nicely
    t = 1 << int(np.floor(np.log2(t)))
    return max(1, min(t, 256))


# --------------------------------------------------------------- kernels


def _rev_alive_kernel(rev_ref, bits_ref, out_ref):
    rev = rev_ref[:]
    word = bits_ref[(rev >> 5).astype(jnp.int32)]
    out_ref[:] = ((word >> (rev & 31).astype(jnp.uint32)) & 1).astype(
        jnp.uint8
    )


def rev_alive_lookup(
    rev: jax.Array, alive_bits: jax.Array, interpret: bool = False
) -> jax.Array:
    """alive flag of each slot's reverse edge: packed-word gather with the
    bit table resident in VMEM. ``rev`` pad slots must index a zero bit."""
    n, w = rev.shape
    tile = _tile_rows(n, w)
    npad = -(-n // tile) * tile
    if npad != n:
        rev = jnp.pad(rev, ((0, npad - n), (0, 0)))
    out = pl.pallas_call(
        _rev_alive_kernel,
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, w), jnp.uint8),
        interpret=interpret,
    )(rev, alive_bits)
    return out[:n].astype(bool)


def _gather_accept_kernel(
    adj_ref, alive_rev_ref, mask_ref, tv_ref,
    tn_ref, accept_ref, sendok_ref,
):
    p_bits = tv_ref[adj_ref[:]].astype(jnp.uint16)  # VMEM-table gather
    send_ok = (p_bits != 0) & (alive_rev_ref[:] != 0)
    p_bits = jnp.where(send_ok, p_bits, jnp.uint16(0))
    accept = (p_bits & mask_ref[:]) != 0
    pa = jnp.where(accept, p_bits, jnp.uint16(0))
    # OR-reduce along the row: uint16 bitsets OR == max over each bit; use
    # a loop-free decomposition via repeated pairwise OR on the lane axis
    tn = jax.lax.reduce(
        pa.astype(jnp.uint32), np.uint32(0), jax.lax.bitwise_or,
        dimensions=[1],
    )
    tn_ref[:] = tn[:, None].astype(jnp.uint16)
    accept_ref[:] = accept.astype(jnp.uint8)
    sendok_ref[:] = jnp.sum(
        send_ok.astype(jnp.int32), axis=1, keepdims=True
    )


def gather_accept_or(
    adj: jax.Array,
    alive_rev: jax.Array,
    adj_mask_rows: jax.Array,
    tv_table: jax.Array,
    interpret: bool = False,
):
    """Fused tv-gather + accept + row-OR for one ELL bucket.

    adj [n, w] int32 (pad slots index tv_table's zero pad entry);
    alive_rev [n, w] bool; adj_mask_rows [n] uint16 accept mask per row;
    tv_table [Vpad] uint16 (VMEM-resident). Returns (tn_rows [n] uint16,
    accept [n, w] bool, sendok_rows [n] int32)."""
    n, w = adj.shape
    tile = _tile_rows(n, w)
    npad = -(-n // tile) * tile
    if npad != n:
        adj = jnp.pad(adj, ((0, npad - n), (0, 0)))
        alive_rev = jnp.pad(alive_rev, ((0, npad - n), (0, 0)))
        adj_mask_rows = jnp.pad(adj_mask_rows, (0, npad - n))
    mask2 = adj_mask_rows[:, None].astype(jnp.uint16)
    tn, accept, sendok = pl.pallas_call(
        _gather_accept_kernel,
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, 1), jnp.uint16),
            jax.ShapeDtypeStruct((npad, w), jnp.uint8),
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        adj,
        alive_rev.astype(jnp.uint8),
        mask2,
        tv_table,
    )
    return (
        tn[:n, 0],
        accept[:n].astype(bool),
        sendok[:n, 0],
    )


def pack_alive(alive: jax.Array) -> jax.Array:
    """Bit-pack a bool flag array into uint32 words (bit i of word j =
    flag[32j + i]); the packed table is what fits in VMEM."""
    n = alive.shape[0]
    npad = -(-n // 32) * 32
    a = jnp.pad(alive.astype(jnp.uint32), (0, npad - n)).reshape(-1, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return jnp.sum(a * weights, axis=1, dtype=jnp.uint32)


_SUPPORT_CACHE: dict = {}


def pallas_supported() -> bool:
    """Probe whether the current backend compiles the VMEM-table gather
    (Mosaic dynamic gather support differs across jaxlib/TPU versions)."""
    key = jax.default_backend()
    if key in _SUPPORT_CACHE:
        return _SUPPORT_CACHE[key]
    try:
        table = jnp.arange(256, dtype=jnp.uint16)
        adj = jnp.zeros((8, 128), dtype=jnp.int32)
        flags = jnp.zeros((8, 128), dtype=bool)
        mask = jnp.full(8, 0xFFFF, dtype=jnp.uint16)
        tn, _, _ = gather_accept_or(adj, flags, mask, table)
        jax.block_until_ready(tn)
        _SUPPORT_CACHE[key] = True
    except Exception:
        _SUPPORT_CACHE[key] = False
    return _SUPPORT_CACHE[key]
