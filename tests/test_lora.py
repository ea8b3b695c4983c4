"""Multi-LoRA serving: per-request adapters over one base model.

The decisive oracle: a stacked per-row adapter must generate exactly what
the MERGED model (W' = W + A @ B) does — for every row of a mixed-adapter
batch, through prefill, decode, and the engine end to end. Prefix caching
must never share pages across adapters (the KV depends on wk/wv deltas).

The reference is a kernel library with no serving layer (SURVEY.md §0);
multi-LoRA extends the engine the same way the scheduler/allocator do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models import llama, lora
from flash_attention_tpu.serving.engine import Engine

CFG = llama.LlamaConfig.tiny()
ALL_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _mk_adapter(seed, targets=ALL_TARGETS, rank=4):
    ad = lora.init_adapter(jax.random.PRNGKey(seed), CFG, rank, targets)
    # init_adapter zero-inits B (standard LoRA no-op start); fill it so the
    # adapter actually changes the model
    return {t: (a, jax.random.normal(jax.random.PRNGKey(seed + 100),
                                     b.shape, jnp.float32) * 0.05)
            for t, (a, b) in ad.items()}


def _greedy_dense(params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits, _, _ = llama.prefill(params,
                                     jnp.asarray(toks, jnp.int32)[None], CFG)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_lora_prefill_matches_merged(params):
    """Mixed-adapter batch: row 0 base, rows 1-2 two different adapters —
    each row's logits equal the corresponding merged model's."""
    ad1, ad2 = _mk_adapter(1), _mk_adapter(2)
    stacks = lora.stack_adapters(CFG, [ad1, ad2], 4, ALL_TARGETS, n_slots=4)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 255, (3, 17)),
                       jnp.int32)
    logits, _, _ = llama.prefill({**params, "lora": stacks}, toks, CFG,
                                 lora_ids=jnp.asarray([0, 1, 2], jnp.int32))
    oracles = [params, lora.merge_adapter(params, ad1),
               lora.merge_adapter(params, ad2)]
    for row, oracle in enumerate(oracles):
        want, _, _ = llama.prefill(oracle, toks, CFG)
        np.testing.assert_allclose(np.asarray(logits[row]),
                                   np.asarray(want[row]),
                                   rtol=2e-4, atol=2e-4)


def test_lora_decode_matches_merged(params):
    """Paged decode with per-row adapters equals the merged models."""
    ad = _mk_adapter(3)
    stacks = lora.stack_adapters(CFG, [ad], 4, ALL_TARGETS, n_slots=2)
    L, hk, hd = CFG.n_layers, CFG.n_kv_heads, CFG.head_dim
    ps, P, npp = 8, 16, 8
    rng = np.random.default_rng(1)
    kp = jnp.asarray(rng.normal(size=(L, hk, P, ps, hd)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(L, hk, P, ps, hd)), jnp.float32)
    tokens = jnp.asarray([7, 7], jnp.int32)       # same token and prefix...
    lengths = jnp.asarray([11, 11], jnp.int32)
    # per-row page tables (rows write divergent K/V for the fed token —
    # shared pages would let one row's write clobber the other's)
    perm = rng.permutation(P)
    tables = jnp.asarray(np.stack([perm[:npp], perm[npp:]]), jnp.int32)
    wpage = tables[:, (11 - 1) // ps]
    woff = jnp.full((2,), (11 - 1) % ps, jnp.int32)
    logits, *_ = llama.decode_step(
        {**params, "lora": stacks}, kp.copy(), vp.copy(), None, None,
        tokens, lengths, tables, wpage, woff, CFG,
        lora_ids=jnp.asarray([0, 1], jnp.int32))  # ...different adapters
    base, *_ = llama.decode_step(params, kp.copy(), vp.copy(), None, None,
                                 tokens, lengths, tables, wpage, woff, CFG)
    merged, *_ = llama.decode_step(
        lora.merge_adapter(params, ad), kp.copy(), vp.copy(), None, None,
        tokens, lengths, tables, wpage, woff, CFG)
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(base[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(merged[1]),
                               rtol=2e-4, atol=2e-4)
    # the two rows genuinely diverge (the adapter is live)
    assert float(jnp.max(jnp.abs(logits[0] - logits[1]))) > 1e-3


def test_engine_multi_lora_matches_merged_models(params):
    """Three requests — base, adapter a, adapter b — decode in ONE batch;
    each completion is bitwise the merged model's greedy chain."""
    ad_a, ad_b = _mk_adapter(4), _mk_adapter(5)
    eng = Engine(CFG, params, total_pages=64, page_size=16, max_batch=4,
                 max_seq_len=128, kv_dtype=jnp.float32, lora_rank=4,
                 lora_targets=ALL_TARGETS)
    eng.add_adapter("a", ad_a)
    eng.add_adapter("b", ad_b)
    rng = np.random.default_rng(2)
    prompt = list(map(int, rng.integers(0, 255, 12)))
    reqs = [eng.add_request(prompt, max_new_tokens=6, lora=name)
            for name in (None, "a", "b")]
    eng.run()
    assert all(r.error is None for r in reqs)
    oracles = [params, lora.merge_adapter(params, ad_a),
               lora.merge_adapter(params, ad_b)]
    outs = [_greedy_dense(o, prompt, 6) for o in oracles]
    assert [r.output for r in reqs] == outs
    assert len({tuple(o) for o in outs}) == 3  # adapters actually diverge


def test_lora_prefix_cache_isolation(params):
    """Prefix caching + LoRA: the same prompt under different adapters must
    NOT share KV pages (wk/wv deltas make the cached KV adapter-specific);
    the same adapter still reuses."""
    ad = _mk_adapter(6)
    eng = Engine(CFG, params, total_pages=64, page_size=16, max_batch=4,
                 max_seq_len=128, kv_dtype=jnp.float32, lora_rank=4,
                 lora_targets=ALL_TARGETS, prefix_cache=True)
    eng.add_adapter("a", ad)
    rng = np.random.default_rng(3)
    prompt = list(map(int, rng.integers(0, 255, 40)))  # 2 full pages
    r1 = eng.add_request(prompt, max_new_tokens=4, lora="a")
    eng.run()
    # same prompt, BASE model: must not adopt the adapter's pages
    r2 = eng.add_request(prompt, max_new_tokens=4)
    eng.run()
    assert eng.stats.get("prefix_reused_tokens", 0) == 0
    # same prompt, same adapter: full reuse
    r3 = eng.add_request(prompt, max_new_tokens=4, lora="a")
    eng.run()
    assert eng.stats["prefix_reused_tokens"] == 2 * 16
    assert r3.output == r1.output
    assert r2.output == _greedy_dense(params, prompt, 4)
    assert r1.output == _greedy_dense(lora.merge_adapter(params, ad),
                                      prompt, 4)


def test_lora_over_quantized_base(params):
    """Adapters apply on top of int8 weight-only base weights (deltas stay
    float; the base matmul runs through quantized_matmul)."""
    qparams = llama.quantize_params(params, bits=8)
    ad = _mk_adapter(7)
    eng = Engine(CFG, qparams, total_pages=64, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32, lora_rank=4,
                 lora_targets=ALL_TARGETS)
    eng.add_adapter("a", ad)
    prompt = list(range(30, 42))
    r_base = eng.add_request(prompt, max_new_tokens=4)
    r_lora = eng.add_request(prompt, max_new_tokens=4, lora="a")
    eng.run()
    assert r_base.error is None and r_lora.error is None
    assert r_base.output != r_lora.output  # the adapter is live


def test_lora_validation(params):
    eng = Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
                 max_seq_len=64, kv_dtype=jnp.float32, lora_rank=4,
                 max_loras=1)
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.add_request([1, 2], 2, lora="missing")
    eng.add_adapter("a", _mk_adapter(8, targets=("wq",), rank=4))
    with pytest.raises(ValueError, match="already registered"):
        eng.add_adapter("a", _mk_adapter(8, targets=("wq",), rank=4))
    with pytest.raises(ValueError, match="capacity"):
        eng.add_adapter("b", _mk_adapter(9, targets=("wq",), rank=4))
    base = Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
                  max_seq_len=64, kv_dtype=jnp.float32)
    with pytest.raises(ValueError, match="without lora_rank"):
        base.add_adapter("a", _mk_adapter(8, targets=("wq",), rank=4))
    with pytest.raises(ValueError, match="speculative"):
        Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
               max_seq_len=64, kv_dtype=jnp.float32, lora_rank=4,
               draft_cfg=CFG, draft_params=params)
