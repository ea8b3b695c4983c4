"""MXU precision policy, shared by every kernel module.

One definition (ADVICE r2: four drifting copies) of the rule discovered on
hardware in round 2: f32 operands must run the MXU at HIGHEST precision — the
default (fastest) setting truncates f32 matmuls to single-pass bf16 on TPU,
which silently voids the fp16-upcasts-to-f32 numerics contract the wrappers
promise (and fails the f32-grade parity gates on hardware). bf16 operands
stay on the native pass via an explicit DEFAULT — passing None would let a
global ``jax_default_matmul_precision=highest`` leak fp32 contract precision
onto bf16 Pallas dots, which Mosaic rejects ("Bad lhs type").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul_precision(dtype) -> jax.lax.Precision:
    if dtype == jnp.float32 and jax.default_backend() == "tpu":
        return jax.lax.Precision.HIGHEST
    # CPU (interpret mode) computes f32 natively-exact; the override is
    # only needed (and only meaningful) on the MXU.
    return jax.lax.Precision.DEFAULT
