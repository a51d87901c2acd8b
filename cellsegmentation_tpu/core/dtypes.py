"""Mixed-precision dtype policy.

TPU MXUs want bf16 operands; parameters, BatchNorm statistics and loss
accumulation stay in f32. Every model takes a `Policy` and casts activations at
module boundaries; convolutions/matmuls accumulate in f32 via
``preferred_element_type`` (flax passes param_dtype/dtype through to lax).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for batch-norm statistics and softmax/loss math
    norm_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return x.astype(self.compute_dtype)


DEFAULT_POLICY = Policy()
# Full-precision policy, used by CPU tests for tighter numerics.
F32_POLICY = Policy(compute_dtype=jnp.float32)
