"""Multi-chip sharding: device meshes, distributed BA reductions, sharded
descriptor-database search, multi-sequence data parallelism.

This is net-new capability relative to the reference, whose only parallelism
is intra-process pthreads (reference backend.h:92, loopclosing.h:107 — see
SURVEY.md §2).  All distribution here rides jax.sharding Meshes with XLA
collectives over ICI; nothing is NCCL/MPI-shaped.
"""
