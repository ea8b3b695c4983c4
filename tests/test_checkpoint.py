"""Checkpoint round-trip, including quantized (int8/int4) params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models import llama
from flash_attention_tpu.models.checkpoint import (load_checkpoint,
                                                   save_checkpoint)
from flash_attention_tpu.ops.quant import QuantizedTensor


def _trees_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_plain(tmp_path):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params)
    loaded = load_checkpoint(path)
    _trees_equal(params, loaded)


def test_roundtrip_quantized(tmp_path):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = llama.quantize_params(params, bits=8)
    path = str(tmp_path / "q.npz")
    save_checkpoint(path, qparams)
    loaded = load_checkpoint(path)
    assert isinstance(loaded["wq"], QuantizedTensor)
    assert loaded["wq"].bits == 8
    _trees_equal(qparams, loaded)


def test_quantized_model_runs(tmp_path):
    """Quantized checkpoint loads and produces close logits."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = llama.quantize_params(params, bits=8)
    toks = jnp.arange(12, dtype=jnp.int32)[None] % cfg.vocab_size
    logits, _, _ = llama.prefill(params, toks, cfg)
    qlogits, _, _ = llama.prefill(qparams, toks, cfg)
    rel = float(jnp.linalg.norm(qlogits - logits) / jnp.linalg.norm(logits))
    assert rel < 0.05, rel
