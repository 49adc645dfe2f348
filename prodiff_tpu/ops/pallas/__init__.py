"""Pallas TPU kernels for the hot ops."""

import jax
import jax.numpy as jnp


def dot_precision(*operands):
    """Explicit dot precision for in-kernel MXU contractions.

    bf16-operand dots are pinned to ``Precision.DEFAULT``: Mosaic's default
    contract precision is single-pass bf16 anyway (measured: pre-cast bf16
    weights vs f32 weights under default precision render BITWISE-identical
    wavs — round-5 MCD bisection), and a global
    ``jax_default_matmul_precision="highest"`` would otherwise reach these
    dots and crash Mosaic (``contract_precision<fp32>`` rejects bf16
    operands). f32-operand dots return None so the global config still flows
    — that is what the precision-pinned parity render relies on.
    """
    if any(jnp.issubdtype(o.dtype, jnp.bfloat16) for o in operands):
        return jax.lax.Precision.DEFAULT
    return None
