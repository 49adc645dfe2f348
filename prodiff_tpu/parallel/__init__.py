"""SPMD parallelism over jax.sharding meshes (replaces the reference's DDP/NCCL)."""
