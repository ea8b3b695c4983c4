"""Tensor-parallel prefill/decode parity vs the single-device model on a
virtual CPU mesh (SURVEY.md §4.6 hostless multi-chip strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from flash_attention_tpu.models import llama
from flash_attention_tpu.parallel.tp_inference import tp_decode_step, tp_prefill

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >= 2 (virtual) devices"
)

CFG = llama.LlamaConfig.tiny()  # n_heads=4, n_kv_heads=2, hidden=512


def _mesh(tp):
    return Mesh(np.asarray(jax.devices()[:tp]), axis_names=("model",))


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def test_tp_prefill_matches_single(params):
    mesh = _mesh(2)
    toks = (jnp.arange(24, dtype=jnp.int32)[None] * 7) % CFG.vocab_size
    logits, ks, vs = llama.prefill(params, toks, CFG)
    tlogits, tks, tvs = tp_prefill(params, toks, cfg=CFG, mesh=mesh)
    np.testing.assert_allclose(np.asarray(tlogits), np.asarray(logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(tks), np.asarray(ks),
                               rtol=2e-4, atol=2e-4)


def test_tp_decode_matches_single(params):
    mesh = _mesh(2)
    L, hk, hd = CFG.n_layers, CFG.n_kv_heads, CFG.head_dim
    total_pages, page_size, pages_per_seq = 16, 8, 8
    b = 2
    rng = np.random.default_rng(0)

    k_pages = jnp.asarray(rng.normal(size=(L, hk, total_pages, page_size, hd)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.normal(size=(L, hk, total_pages, page_size, hd)),
                          jnp.float32)
    tokens = jnp.asarray([3, 9], jnp.int32)
    lengths = jnp.asarray([11, 5], jnp.int32)
    tables = jnp.asarray(rng.permutation(total_pages)[:b * pages_per_seq]
                         .reshape(b, pages_per_seq), jnp.int32)
    wpage = jnp.asarray([int(tables[i, (int(lengths[i]) - 1) // page_size])
                         for i in range(b)], jnp.int32)
    woff = (lengths - 1) % page_size

    # decode_step donates the cache: each call needs its own copy
    logits, kp1, vp1, _, _ = llama.decode_step(
        params, jnp.array(k_pages), jnp.array(v_pages), None, None, tokens,
        lengths, tables, wpage, woff, CFG)
    tlogits, kp2, vp2, _, _ = tp_decode_step(
        params, jnp.array(k_pages), jnp.array(v_pages), tokens, lengths,
        tables, wpage, woff, cfg=CFG, mesh=mesh)
    np.testing.assert_allclose(np.asarray(tlogits), np.asarray(logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kp2), np.asarray(kp1),
                               rtol=1e-5, atol=1e-5)


def test_tp_gemma2_engine_parity():
    """Gemma-2-style model (post norms, softcaps, alternating window, GeGLU)
    served tensor-parallel must match the single-device dense greedy loop —
    pins tree_specs' replicated post-norm entries and the grouped-scan TP
    interaction."""
    from flash_attention_tpu.serving.engine import Engine

    cfg = llama.LlamaConfig.tiny_gemma2(n_layers=2, sliding_window=40)
    gparams = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    eng = Engine(cfg, gparams, total_pages=32, page_size=16, max_batch=2,
                 max_seq_len=256, kv_dtype=jnp.float32, mesh=_mesh(2))
    rng = np.random.default_rng(7)
    prompt = list(map(int, rng.integers(0, 255, size=70)))
    req = eng.add_request(prompt, max_new_tokens=4)
    while eng.sched.has_work:
        eng.step()
    assert req.error is None, req.error

    toks = list(prompt)
    for _ in range(4):
        logits, _, _ = llama.prefill(gparams,
                                     jnp.asarray(toks, jnp.int32)[None], cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert req.output == toks[len(prompt):]


def test_tp_chunked_prefill_engine_parity(params):
    """Chunked prefill through shard_map (tp_prefill_chunk: kv-head-local
    prefix page gather, replicated chunk logits) must emit the same tokens
    as the single-device unchunked engine."""
    from flash_attention_tpu.serving.engine import Engine

    rng = np.random.default_rng(9)
    prompt = list(map(int, rng.integers(0, 255, size=150)))
    outs = []
    for mesh, chunk in ((None, None), (_mesh(2), 64)):
        eng = Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
                     max_seq_len=256, kv_dtype=jnp.float32, mesh=mesh,
                     chunk_size=chunk)
        req = eng.add_request(prompt, max_new_tokens=4)
        while eng.sched.has_work:
            eng.step()
        assert req.error is None, req.error
        outs.append(req.output)
    assert outs[0] == outs[1]
    assert eng.stats["prefill_chunks"] >= 3


def test_tp_qwen2_bias_prefill_matches_single():
    """Qwen-2 QKV biases are column-parallel: each shard adds only its slice
    of the bias. TP prefill must match the single-device model bitwise-ish."""
    cfg = llama.LlamaConfig.tiny_qwen2()
    params = llama.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    assert "bq" in params
    mesh = _mesh(2)
    toks = (jnp.arange(24, dtype=jnp.int32)[None] * 5) % cfg.vocab_size
    logits, _, _ = llama.prefill(params, toks, cfg)
    tlogits, _, _ = tp_prefill(params, toks, cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(tlogits), np.asarray(logits),
                               rtol=2e-4, atol=2e-4)
