"""Pallas fused superstep kernels (ops/lcc_superstep.py) — semantics vs a
pure-jnp reference, in interpreter mode (real-chip behavior is probed and
A/B-measured separately; tools/pallas_ab_bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fuzzypatternmatching_tpu.ops.lcc_superstep import (
    gather_accept_or,
    pack_alive,
    rev_alive_lookup,
)


@pytest.mark.parametrize("shape", [(5, 8), (33, 16), (100, 128)])
def test_rev_alive_lookup(shape):
    rng = np.random.RandomState(0)
    n, w = shape
    S = 500
    alive = rng.rand(S + 1) < 0.5
    alive[S] = False  # pad slot
    rev = rng.randint(0, S + 1, size=(n, w)).astype(np.int32)
    bits = pack_alive(jnp.asarray(alive))
    out = rev_alive_lookup(jnp.asarray(rev), bits, interpret=True)
    assert np.array_equal(np.asarray(out), alive[rev])


@pytest.mark.parametrize("shape", [(7, 8), (50, 64)])
def test_gather_accept_or(shape):
    rng = np.random.RandomState(1)
    n, w = shape
    V = 300
    tv = rng.randint(0, 1 << 16, size=V + 1).astype(np.uint16)
    tv[rng.rand(V + 1) < 0.5] = 0
    tv[V] = 0  # pad entry
    adj = rng.randint(0, V + 1, size=(n, w)).astype(np.int32)
    alive_rev = rng.rand(n, w) < 0.6
    mask = rng.randint(0, 1 << 16, size=n).astype(np.uint16)

    tn, accept, sendok = gather_accept_or(
        jnp.asarray(adj), jnp.asarray(alive_rev), jnp.asarray(mask),
        jnp.asarray(tv), interpret=True,
    )
    # reference semantics (engine/lcc_bucketed.py non-init superstep)
    p_bits = tv[adj]
    send_ok = (p_bits != 0) & alive_rev
    p_bits = np.where(send_ok, p_bits, 0).astype(np.uint16)
    acc_ref = (p_bits & mask[:, None]) != 0
    pa = np.where(acc_ref, p_bits, 0)
    tn_ref = np.bitwise_or.reduce(pa, axis=1)
    assert np.array_equal(np.asarray(tn), tn_ref)
    assert np.array_equal(np.asarray(accept), acc_ref)
    assert np.array_equal(np.asarray(sendok), send_ok.sum(axis=1))


def test_pack_alive_roundtrip():
    rng = np.random.RandomState(2)
    flags = rng.rand(1000) < 0.3
    bits = np.asarray(pack_alive(jnp.asarray(flags)))
    unpacked = (
        (bits[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    ).reshape(-1)[: len(flags)]
    assert np.array_equal(unpacked.astype(bool), flags)


def test_bucketed_engine_pallas_parity():
    """The pallas-fused bucketed engine (interpret mode on CPU) must equal
    the XLA bucketed engine superstep-for-superstep on a full call."""
    from fuzzypatternmatching_tpu.engine.lcc_bucketed import BucketedLccEngine
    from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
    from fuzzypatternmatching_tpu.generators.rmat import RmatParams, generate_edges
    from test_pattern import write_tree_pattern
    from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph
    import tempfile

    parts = [
        generate_edges(RmatParams(seed=5489 + 3 * r, vertex_scale=10,
                                  edge_count=(16 << 10) // 4, scramble=False))
        for r in range(4)
    ]
    src = np.concatenate([p[0] for p in parts])
    dst = np.concatenate([p[1] for p in parts])
    g = from_edges(src, dst, num_vertices=1 << 10)
    labels = degree_labels(g)
    pat = load_pattern_graph(write_tree_pattern(__import__("pathlib").Path(tempfile.mkdtemp())))

    base = BucketedLccEngine(g, labels, pat)
    fused = BucketedLccEngine(
        g, labels, pat, use_pallas=True, pallas_interpret=True
    )
    st_b, rows_b, died_b = base.lcc_call(base.init_state(), True)
    st_f, rows_f, died_f = fused.lcc_call(fused.init_state(), True)
    assert [r[:3] for r in rows_b] == [r[:3] for r in rows_f]
    assert died_b == died_f
    tvb, alb = base.state_to_global(st_b)
    tvf, alf = fused.state_to_global(st_f)
    assert np.array_equal(tvb, tvf)
    assert np.array_equal(alb, alf)
    # continuation call from a repacked state also matches
    st_b2, rows_b2, _ = base.lcc_call(st_b, False)
    st_f2, rows_f2, _ = fused.lcc_call(st_f, False)
    assert [r[:3] for r in rows_b2] == [r[:3] for r in rows_f2]
