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


@pytest.fixture(scope="module")
def hf_mistral():
    # sliding_window=16 < prompt length so the window mask is live in HF too
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=16, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.MistralForCausalLM(cfg)
    model.eval()
    return model


def test_mistral_sliding_window_logits_match_hf(hf_mistral):
    params, cfg = from_hf(hf_mistral, dtype=jnp.float32)
    assert cfg.sliding_window == 16 and cfg.window_pattern == 1
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 128, size=(2, 33))
    with torch.no_grad():
        hf_logits = hf_mistral(torch.from_numpy(toks)).logits.numpy()
    logits, _, _ = llama.prefill(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def hf_gemma2():
    # all the Gemma-2 deltas on: alternating sliding/global layers,
    # (1+w) norms, sandwich norms, GeGLU-tanh, both softcaps,
    # query_pre_attn_scalar, sqrt(dim) embed scaling, tied embeddings
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=512, rms_norm_eps=1e-6,
        rope_theta=10000.0, sliding_window=16, query_pre_attn_scalar=128,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        attn_implementation="eager",  # sdpa silently drops the attn softcap
    )
    torch.manual_seed(2)
    model = transformers.Gemma2ForCausalLM(cfg)
    model.eval()
    return model


def test_gemma2_logits_match_hf(hf_gemma2):
    params, cfg = from_hf(hf_gemma2, dtype=jnp.float32)
    assert (cfg.window_pattern == 2 and cfg.attn_softcap == 50.0
            and cfg.final_softcap == 30.0 and cfg.post_norms
            and cfg.embed_scale and cfg.sm_scale == 128 ** -0.5)
    assert "norm_post_attn" in params
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 128, size=(2, 33))  # 33 > window 16
    with torch.no_grad():
        hf_logits = hf_gemma2(torch.from_numpy(toks)).logits.numpy()
    logits, _, _ = llama.prefill(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-3, atol=2e-3)


def test_gemma2_greedy_generation_matches_hf(hf_gemma2):
    params, cfg = from_hf(hf_gemma2, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 128, size=(1, 21))
    with torch.no_grad():
        hf_out = hf_gemma2.generate(
            torch.from_numpy(prompt), max_new_tokens=5, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, 21:].tolist()

    from flash_attention_tpu.serving.engine import Engine
    eng = Engine(cfg, params, total_pages=16, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32)
    req = eng.add_request([int(t) for t in prompt[0]], max_new_tokens=5)
    eng.run()
    assert req.output == hf_new, (req.output, hf_new)


@pytest.fixture(scope="module")
def hf_llama31():
    # original_max_position_embeddings=16 << prompt length so ALL three
    # rope_scaling branches (stretch / base / interpolation band) are live
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 16},
    )
    torch.manual_seed(2)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def test_llama31_rope_scaling_logits_match_hf(hf_llama31):
    params, cfg = from_hf(hf_llama31, dtype=jnp.float32)
    assert cfg.rope_scaling == (8.0, 1.0, 4.0, 16)
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 128, size=(2, 49))
    with torch.no_grad():
        hf_logits = hf_llama31(torch.from_numpy(toks)).logits.numpy()
    logits, _, _ = llama.prefill(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-3, atol=2e-3)
    # scaling changes the numbers: the same weights WITHOUT the remap must
    # NOT match (guards against the remap silently not being applied)
    import dataclasses
    plain = dataclasses.replace(cfg, rope_scaling=None)
    logits_plain, _, _ = llama.prefill(params, jnp.asarray(toks, jnp.int32),
                                       plain)
    assert np.abs(np.asarray(logits_plain) - hf_logits).max() > 1e-2


def test_llama31_generation_matches_hf(hf_llama31):
    params, cfg = from_hf(hf_llama31, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 128, size=(1, 21))
    with torch.no_grad():
        hf_out = hf_llama31.generate(
            torch.from_numpy(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, 21:].tolist()
    from flash_attention_tpu.serving.engine import Engine
    eng = Engine(cfg, params, total_pages=16, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32)
    req = eng.add_request([int(t) for t in prompt[0]], max_new_tokens=6)
    eng.run()
    assert req.output == hf_new, (req.output, hf_new)


@pytest.fixture(scope="module")
def hf_qwen2():
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=False, sliding_window=None,
    )
    torch.manual_seed(5)
    model = transformers.Qwen2ForCausalLM(cfg)
    # HF initializes the QKV biases to zero, which would make a parity test
    # blind to the bias path — randomize them so the test proves the biases
    # are applied
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("proj.bias"):
                p.normal_(0.0, 0.5)
    model.eval()
    return model


def test_qwen2_bias_logits_match_hf(hf_qwen2):
    params, cfg = from_hf(hf_qwen2, dtype=jnp.float32)
    assert cfg.attn_bias and "bq" in params
    rng = np.random.default_rng(6)
    toks = rng.integers(0, 128, size=(2, 37))
    with torch.no_grad():
        hf_logits = hf_qwen2(torch.from_numpy(toks)).logits.numpy()
    logits, _, _ = llama.prefill(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-3, atol=2e-3)
    # dropping the biases must change the numbers (the bias path is live)
    import dataclasses
    nobias_params = {k: v for k, v in params.items()
                     if k not in ("bq", "bk", "bv")}
    nobias = dataclasses.replace(cfg, attn_bias=False)
    logits_nb, _, _ = llama.prefill(nobias_params,
                                    jnp.asarray(toks, jnp.int32), nobias)
    assert np.abs(np.asarray(logits_nb) - hf_logits).max() > 1e-2


def test_qwen2_generation_matches_hf(hf_qwen2):
    params, cfg = from_hf(hf_qwen2, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 128, size=(1, 15))
    with torch.no_grad():
        hf_out = hf_qwen2.generate(
            torch.from_numpy(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, 15:].tolist()
    from flash_attention_tpu.serving.engine import Engine
    eng = Engine(cfg, params, total_pages=16, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32)
    req = eng.add_request([int(t) for t in prompt[0]], max_new_tokens=6)
    eng.run()
    assert req.output == hf_new, (req.output, hf_new)


@pytest.fixture(scope="module")
def hf_mixtral():
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=None, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    model = transformers.MixtralForCausalLM(cfg)
    model.eval()
    return model


def test_mixtral_logits_match_hf(hf_mixtral):
    """Sparse-MoE forward (router top-2 + grouped expert matmuls) vs HF's
    MixtralSparseMoeBlock — completely independent dispatch machinery."""
    params, cfg = from_hf(hf_mixtral, dtype=jnp.float32)
    assert cfg.n_experts == 4 and cfg.n_experts_per_tok == 2
    rng = np.random.default_rng(5)
    toks = rng.integers(0, 128, size=(2, 33))
    with torch.no_grad():
        hf_logits = hf_mixtral(torch.from_numpy(toks)).logits.numpy()
    logits, _, _ = llama.prefill(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=2e-3, atol=2e-3)


def test_mixtral_greedy_generation_matches_hf(hf_mixtral):
    params, cfg = from_hf(hf_mixtral, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 128, size=(1, 12))
    with torch.no_grad():
        hf_out = hf_mixtral.generate(
            torch.from_numpy(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, 12:].tolist()

    from flash_attention_tpu.serving.engine import Engine
    eng = Engine(cfg, params, total_pages=16, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32)
    req = eng.add_request([int(t) for t in prompt[0]], max_new_tokens=6)
    eng.run()
    assert req.output == hf_new, (req.output, hf_new)
