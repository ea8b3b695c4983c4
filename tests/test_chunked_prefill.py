"""Chunked prefill: long prompts processed in fixed-size pieces.

The contract is EXACTNESS, not approximation: ``llama.prefill_chunk`` on
columns [done, done+clen) — chunk queries attending [prefix pages || chunk]
through the segmented flash path — must reproduce what whole-prompt
``prefill`` computes for the same columns, and a chunked engine must emit the
same tokens as an unchunked one. The reference has no serving layer at all
(SURVEY.md §0); chunked prefill is part of the serving north star (bounded
time-to-first-dispatch and O(chunk) activation memory on long prompts).

The decisive regression here is chunked x sliding-window: admission must NOT
hole-allocate pages that an intermediate chunk's window still reads
(engine.__init__ caps the admission frontier at chunk_size and
_prefill_chunked releases the rest progressively).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models import llama
from flash_attention_tpu.serving.engine import Engine

PS = 16  # page size for the function-level cache fixtures


def _cache_from_prefill(cfg, ks, vs, done, npp, dtype=jnp.float32):
    """Scatter prefill K/V (L, b, s, hk, hd) token-range [0, done_i) of each
    row into a fresh paged cache; returns (k_pages, v_pages, tables).
    Pages past a row's prefix are left allocated-but-stale (masked by done)."""
    L, b, s, hk, hd = ks.shape
    total = b * npp + 1
    k_pages = jnp.zeros((L, hk, total, PS, hd), dtype)
    v_pages = jnp.zeros_like(k_pages)
    tables = jnp.arange(b * npp, dtype=jnp.int32).reshape(b, npp)
    for i in range(b):
        for p in range(npp):
            lo = p * PS
            n = min(PS, max(0, int(done[i]) - lo), s - lo)
            if n <= 0:
                continue
            k_pages = k_pages.at[:, :, tables[i, p], :n].set(
                ks[:, i, lo:lo + n].transpose(0, 2, 1, 3).astype(dtype))
            v_pages = v_pages.at[:, :, tables[i, p], :n].set(
                vs[:, i, lo:lo + n].transpose(0, 2, 1, 3).astype(dtype))
    return k_pages, v_pages, tables


@pytest.mark.parametrize("family", ["llama", "gemma2"])
def test_prefill_chunk_matches_full(family):
    """Chunk logits == full-prefill logits at the chunk's columns, including
    ragged rows (different done / chunk_len per row) and pad tails."""
    if family == "llama":
        cfg = llama.LlamaConfig.tiny()
    else:
        # window 64 < prompt: the global/window layer alternation, softcaps
        # and sandwich norms all cross the chunk boundary
        cfg = llama.LlamaConfig.tiny_gemma2(n_layers=2, sliding_window=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    b, s, c = 2, 96, 32
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.vocab_size)
    full_logits, ks, vs = llama.prefill(params, tokens, cfg)

    # row 0: full chunk [64, 96); row 1: ragged — prefix 48, 16 live tokens
    done = np.array([64, 48], np.int32)
    clen = np.array([32, 16], np.int32)
    npp = 4  # covers the max prefix (64 tokens); row 1's last page is stale
    kp, vp, tables = _cache_from_prefill(cfg, ks, vs, done, npp)
    chunk_toks = jnp.stack([tokens[0, 64:96], tokens[1, 48:80]])
    logits, cks, cvs = llama.prefill_chunk(
        params, chunk_toks, jnp.asarray(done), jnp.asarray(clen),
        kp, vp, None, None, tables, cfg)
    assert cks.shape == (cfg.n_layers, b, c, cfg.n_kv_heads, cfg.head_dim)
    for i in range(b):
        n = int(clen[i])
        want = full_logits[i, done[i]:done[i] + n]
        got = logits[i, :n]
        err = float(jnp.max(jnp.abs(want - got)))
        assert err < 5e-4, f"row {i}: chunk-vs-full logits diverge: {err}"
        # the returned chunk K/V must equal the full-prefill K/V there
        np.testing.assert_allclose(
            np.asarray(cks[:, i, :n]), np.asarray(ks[:, i, done[i]:done[i] + n]),
            rtol=1e-5, atol=1e-5)


def test_prefill_chunk_quantized_prefix():
    """A quantized (int8 per-token scales) prefix cache must gather through
    the same dequantization the paged decode kernel fuses — near the f32
    answer (int8 ~1%), catastrophically wrong if scales were dropped."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    b, s, c = 1, 64, 32
    tokens = jax.random.randint(jax.random.PRNGKey(3), (b, s), 0,
                                cfg.vocab_size)
    _, ks, vs = llama.prefill(params, tokens, cfg)
    done = np.array([32], np.int32)
    clen = np.array([32], np.int32)
    npp = 2
    kp, vp, tables = _cache_from_prefill(cfg, ks, vs, done, npp)
    logits_f32, _, _ = llama.prefill_chunk(
        params, tokens[:, 32:], jnp.asarray(done), jnp.asarray(clen),
        kp, vp, None, None, tables, cfg)

    # quantize the prefix per token; scale layout = lane t of an (8, 128)
    # tile per page (what write_prefill_to_pages stores)
    L, hk = cfg.n_layers, cfg.n_kv_heads
    total = kp.shape[2]
    kq, ksc = llama._quantize_token(kp)   # (L,hk,total,PS,hd), (L,hk,total,PS)
    vq, vsc = llama._quantize_token(vp)

    def pack(sc):
        sc = jnp.pad(sc, ((0, 0), (0, 0), (0, 0), (0, 128 - PS)),
                     constant_values=1.0)
        return jnp.broadcast_to(sc[:, :, :, None, :], (L, hk, total, 8, 128))

    logits_q, _, _ = llama.prefill_chunk(
        params, tokens[:, 32:], jnp.asarray(done), jnp.asarray(clen),
        kq, vq, pack(ksc), pack(vsc), tables, cfg)
    rel = float(jnp.linalg.norm(logits_q - logits_f32)
                / (jnp.linalg.norm(logits_f32) + 1e-9))
    assert rel < 0.05, f"quantized-prefix chunk rel err {rel}"


def _greedy_dense(cfg, params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits, _, _ = llama.prefill(params,
                                     jnp.asarray(toks, jnp.int32)[None], cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_engine_chunked_matches_unchunked():
    """Chunked engine == unchunked engine == dense greedy, on a batch of
    uneven prompt lengths spanning 1, 2 and 3 chunks."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    rng = np.random.default_rng(11)
    prompts = [list(map(int, rng.integers(0, 255, size=n)))
               for n in (40, 90, 150)]

    outs = []
    for chunk in (None, 64):
        eng = Engine(cfg, params, total_pages=64, page_size=16, max_batch=4,
                     max_seq_len=256, kv_dtype=jnp.float32, chunk_size=chunk)
        reqs = [eng.add_request(p, max_new_tokens=4) for p in prompts]
        while eng.sched.has_work:
            eng.step()
        assert all(r.error is None for r in reqs), [r.error for r in reqs]
        outs.append([r.output for r in reqs])
    assert outs[0] == outs[1]
    assert outs[0][2] == _greedy_dense(cfg, params, prompts[2], 4)
    # the 150-token prompt must actually have taken 3 chunks
    assert eng.stats["prefill_chunks"] >= 3


def test_engine_chunked_sliding_window():
    """Chunked x sliding-window: an intermediate chunk's queries read prefix
    keys INSIDE their window from pages — admission must not have holed
    them (the final-position holes of the unchunked path would corrupt
    them into trash-page garbage), and pages behind the advancing chunk
    frontier must be progressively released."""
    cfg = llama.LlamaConfig.tiny(sliding_window=96)
    params = llama.init_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    rng = np.random.default_rng(12)
    prompt = list(map(int, rng.integers(0, 255, size=300)))

    def greedy(n_new):
        toks = list(prompt)
        for _ in range(n_new):
            logits, _, _ = llama.prefill(
                params, jnp.asarray(toks, jnp.int32)[None], cfg)
            toks.append(int(jnp.argmax(logits[0, -1])))
        return toks[len(prompt):]

    eng = Engine(cfg, params, total_pages=32, page_size=16, max_batch=1,
                 max_seq_len=512, kv_dtype=jnp.float32, chunk_size=64)
    req = eng.add_request(prompt, max_new_tokens=4)
    freed_mid_prefill = eng.rt.free_pages()
    while eng.sched.has_work:
        eng.step()
        freed_mid_prefill = max(freed_mid_prefill, eng.rt.free_pages())
    assert req.error is None and req.output == greedy(4)
    # progressive release: by the end, pages behind the window are holes
    # again (300+4 tokens = 19 pages, window 96 = 6 pages + kernel-block
    # slack; well below the 19 a no-release run would still hold)
    assert eng.rt.free_pages() >= 32 - 1 - 16


def test_engine_chunked_kv_quant_runs():
    """Chunked prefill composes with the int8 KV cache (prefix gathered via
    per-token scales); greedy output matches the unchunked quantized engine
    (identical page contents — both quantize the same K/V at scatter)."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(6), cfg, jnp.float32)
    rng = np.random.default_rng(13)
    prompt = list(map(int, rng.integers(0, 255, size=200)))
    outs = []
    for chunk in (None, 128):
        eng = Engine(cfg, params, total_pages=16, page_size=128, max_batch=1,
                     max_seq_len=512, kv_quant=True, chunk_size=chunk)
        req = eng.add_request(prompt, max_new_tokens=4)
        while eng.sched.has_work:
            eng.step()
        assert req.error is None, req.error
        outs.append(req.output)
    assert outs[0] == outs[1]


def test_engine_chunk_size_validation():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    with pytest.raises(ValueError, match="multiple of page_size"):
        Engine(cfg, params, total_pages=16, page_size=16, chunk_size=40)
