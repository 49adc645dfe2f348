"""Training runtime: optimizer, checkpointing, trainer loop (replaces the
reference's home-grown TrainHandler + BaseTask + DDP stack)."""
