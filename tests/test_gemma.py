"""Gemma-2-style model family tests.

The second model family beyond Llama/Mistral: alternating sliding-window /
global layers (``window_pattern=2`` — the window is a STATIC kernel arg, so
heterogeneous stacks scan over layer GROUPS, ``models.llama._group_layers``),
GeGLU MLP, sandwich (post-attn/post-mlp) norms, attention-logit softcap,
final-logit softcap, query_pre_attn scaling, and embedding normalization.

The load-bearing check is prefill-vs-decode consistency: both paths must
agree on which layers slide and on every softcap/norm placement, or the
logits of the same token diverge between the flash (training) and paged
(serving) kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    decode_step,
    init_params,
    prefill,
    quantize_params,
)

PAGE = 128


def _paged_cache(cfg, ks, vs, b, s, pps, dtype=jnp.float32):
    """Scatter prefill K/V (L, b, s, hk, hd) into a fresh paged cache."""
    L, hk, hd = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    total = b * pps + 1
    k_pages = jnp.zeros((L, hk, total, PAGE, hd), dtype)
    v_pages = jnp.zeros_like(k_pages)
    tables = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    for i in range(b):
        for p in range(-(-s // PAGE)):
            sl = slice(p * PAGE, min((p + 1) * PAGE, s))
            n = sl.stop - sl.start
            k_pages = k_pages.at[:, :, tables[i, p], :n].set(
                ks[:, i, sl].transpose(0, 2, 1, 3))
            v_pages = v_pages.at[:, :, tables[i, p], :n].set(
                vs[:, i, sl].transpose(0, 2, 1, 3))
    return k_pages, v_pages, tables


@pytest.mark.parametrize("pattern", [1, 2])
def test_gemma2_prefill_decode_consistency(pattern):
    """Decode step through the paged path must reproduce the logits prefill
    computes for the same token — across alternating window layers, softcaps,
    GeGLU and sandwich norms."""
    cfg = LlamaConfig.tiny_gemma2(n_layers=4, window_pattern=pattern,
                                  sliding_window=64)
    params = init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    b, s, pps = 2, 96, 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.vocab_size)
    logits, ks, vs = prefill(params, tokens, cfg)
    assert ks.shape == (cfg.n_layers, b, s, cfg.n_kv_heads, cfg.head_dim)

    k_pages, v_pages, tables = _paged_cache(cfg, ks, vs, b, s, pps)
    nxt = jax.random.randint(jax.random.PRNGKey(2), (b,), 0, cfg.vocab_size)
    dl, *_ = decode_step(params, k_pages, v_pages, None, None, nxt,
                         jnp.full((b,), s + 1, jnp.int32), tables,
                         tables[:, 0], jnp.full((b,), s, jnp.int32), cfg)
    pl2, _, _ = prefill(params, jnp.concatenate([tokens, nxt[:, None]], 1),
                        cfg)
    err = float(jnp.max(jnp.abs(dl - pl2[:, -1])))
    assert err < 5e-4, f"decode-vs-prefill logits diverge: {err}"


def test_gemma2_window_alternation_matters():
    """With window_pattern=2 the odd (global) layers must NOT be windowed:
    a model where all layers slide gives different logits on long context."""
    base = dict(n_layers=2, sliding_window=32)
    cfg_alt = LlamaConfig.tiny_gemma2(window_pattern=2, **base)
    cfg_all = LlamaConfig.tiny_gemma2(window_pattern=1, **base)
    params = init_params(jax.random.PRNGKey(3), cfg_alt, jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 80), 0,
                                cfg_alt.vocab_size)
    la, _, _ = prefill(params, tokens, cfg_alt)
    lb, _, _ = prefill(params, tokens, cfg_all)
    assert float(jnp.max(jnp.abs(la - lb))) > 1e-4


def test_gemma2_softcaps_matter():
    cfg = LlamaConfig.tiny_gemma2(n_layers=2)
    cfg_nocap = LlamaConfig.tiny_gemma2(n_layers=2, attn_softcap=None,
                                        final_softcap=None)
    params = init_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(6), (1, 48), 0,
                                cfg.vocab_size)
    lc, _, _ = prefill(params, tokens, cfg)
    ln, _, _ = prefill(params, tokens, cfg_nocap)
    assert float(jnp.max(jnp.abs(lc - ln))) > 1e-4
    # final softcap bounds the logits
    assert float(jnp.max(jnp.abs(lc))) <= cfg.final_softcap + 1e-3


def test_gemma2_quantized_weights():
    """Weight-only int8 quantization composes with the Gemma-2 stack (the
    grouped scan reshapes QuantizedTensor leaves too)."""
    cfg = LlamaConfig.tiny_gemma2(n_layers=2, dim=256, hidden_dim=512)
    params = init_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    qparams = quantize_params(params, bits=8)
    tokens = jax.random.randint(jax.random.PRNGKey(8), (1, 48), 0,
                                cfg.vocab_size)
    lf, _, _ = prefill(params, tokens, cfg)
    lq, _, _ = prefill(qparams, tokens, cfg)
    # int8 weight error is small but nonzero; logits bounded by final cap
    rel = float(jnp.linalg.norm(lf - lq) / (jnp.linalg.norm(lf) + 1e-9))
    assert rel < 0.1, rel
    assert float(jnp.max(jnp.abs(lq))) <= cfg.final_softcap + 1e-3


def test_gemma2_bad_pattern_rejected():
    cfg = LlamaConfig.tiny_gemma2(n_layers=3, window_pattern=2)
    params = init_params(jax.random.PRNGKey(9), cfg, jnp.float32)
    tokens = jnp.zeros((1, 16), jnp.int32)
    with pytest.raises(ValueError, match="window_pattern"):
        prefill(params, tokens, cfg)


def test_gemma2_9b_preset_geometry():
    cfg = LlamaConfig.gemma2_9b()
    assert cfg.n_layers % cfg.window_pattern == 0
    assert cfg.layer_window(0) == 4096       # even layers slide
    assert cfg.layer_window(1) is None       # odd layers are global
    assert cfg.sm_scale == 256.0**-0.5
    assert cfg.head_dim == 256 and cfg.n_kv_heads == 8
