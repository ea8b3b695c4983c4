"""Logits parity of the full model stack vs HuggingFace transformers.

The strongest end-to-end correctness test available without pretrained
weights: a randomly-initialized HF Llama (torch, CPU) and our import of its
state dict must produce matching logits through completely independent
implementations (torch SDPA vs our Pallas kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attention_tpu.models import llama
from flash_attention_tpu.models.import_hf import from_hf


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def test_prefill_logits_match_hf(hf_model):
    params, cfg = from_hf(hf_model, dtype=jnp.float32)
    assert cfg.head_dim == 128
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 128, size=(2, 33))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(toks)).logits.numpy()
    logits, _, _ = llama.prefill(params, jnp.asarray(toks, jnp.int32), cfg)
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_greedy_generation_matches_hf(hf_model):
    params, cfg = from_hf(hf_model, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 128, size=(1, 12))
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.from_numpy(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, 12:].tolist()

    from flash_attention_tpu.serving.engine import Engine
    eng = Engine(cfg, params, total_pages=16, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32)
    req = eng.add_request([int(t) for t in prompt[0]], max_new_tokens=6)
    eng.run()
    assert req.output == hf_new, (req.output, hf_new)
