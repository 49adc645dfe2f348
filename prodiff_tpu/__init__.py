"""ProDiff-TPU: a TPU-native (JAX/XLA/Pallas) singing-voice-synthesis framework.

A ground-up rebuild of the capabilities of the ProDiff/DiffSinger-lineage SVS
framework (reference: T1uTiu/ProDiff) designed TPU-first:

- flax.linen model zoo compiled with XLA (static shapes, masked batching)
- diffusion sampling as ``lax.scan`` loops inside one jit
- data parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` (SPMD), not DDP
- Pallas kernels for the hot ops (WaveNet denoiser stack, LVC convolution)
- orbax-style step-numbered checkpoints with keep-K/best-metric semantics

Layering mirrors the reference (``SURVEY.md`` §1): utils → models → components
(tasks/binarizers/vocoders/pe) → handlers → CLI.
"""

__version__ = "0.1.0"
