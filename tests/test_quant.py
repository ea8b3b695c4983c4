"""Weight-only quantized matmul kernels vs plain-JAX dequant oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.quant import (dequantize, quantize_int4,
                                           quantize_int8, quantized_matmul)


@pytest.mark.parametrize("quant,bits,budget", [
    (quantize_int8, 8, 0.02), (quantize_int4, 4, 0.25),
])
@pytest.mark.parametrize("m", [8, 100, 256])
def test_quantized_matmul(quant, bits, budget, m):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, 512)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(512, 512)), jnp.float32)
    qt = quant(w)
    assert qt.bits == bits
    y = quantized_matmul(x, qt)
    yref = x @ dequantize(qt)
    # kernel vs dequant oracle: near-exact (same fp32 math)
    rel = float(jnp.max(jnp.abs(y - yref)) / (jnp.max(jnp.abs(yref)) + 1e-9))
    assert rel < 1e-5, f"kernel deviates from dequant oracle: {rel}"
    # quantization budget vs full precision
    l2 = float(jnp.linalg.norm(y - x @ w) / jnp.linalg.norm(x @ w))
    assert l2 < budget, f"bits={bits} quant error {l2} > {budget}"


def test_quantized_matmul_jit_boundary():
    """QuantizedTensor must cross jit boundaries (bits is static aux)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    qt = quantize_int8(w)

    @jax.jit
    def f(x, qt):
        return quantized_matmul(x, qt)

    y = f(x, qt)
    assert y.shape == (64, 256)
