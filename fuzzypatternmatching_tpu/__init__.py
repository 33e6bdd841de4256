"""fuzzypatternmatching_tpu — a TPU-native distributed fuzzy pattern matching engine.

A from-scratch re-design of HavoqGT-style distributed fuzzy/approximate
pattern matching (PruneJuice) for TPU hardware:

* The asynchronous MPI visitor/mailbox runtime of the reference
  (reference: include/havoqgt/visitor_queue.hpp, new_mailbox.hpp) is
  re-expressed as bulk-synchronous supersteps over dense sharded arrays.
* The distributed delegate-partitioned CSR (reference:
  include/havoqgt/delegate_partitioned_graph.hpp) becomes a sharded CSR with
  receiver-centric edge state; hub handling is implicit in the dense layout.
* Communication is XLA collectives over a `jax.sharding.Mesh` (all_gather of
  per-vertex state + static-routed edge-state exchange) instead of MPI
  point-to-point.

Public entry points:
  - generators:  rmat_edge_generator parity stream, edge-list ingest
  - graph:       Graph (CSR), storage (persistent shards)
  - pattern:     PatternGraph, NonLocalConstraints (reference file formats)
  - engine:      match() — LCC + NLCC prune-to-fixpoint + enumeration
  - algorithms:  bfs, connected_components, pagerank, kth_core, sssp, triangles
"""

__version__ = "0.1.0"
