"""Automatic prefix caching: refcounted pages, the chain-hash registry, and
engine end-to-end reuse.

The decisive properties: cached-prefix generation is BITWISE the uncached
generation (adopted pages hold exactly the KV the suffix prefill would have
recomputed); pages free only on their last reference; eviction under
pressure never breaks a running sequence; preemption + re-admission adopts
the request's own still-pinned prompt pages.

The reference is a kernel library with no serving layer (SURVEY.md §0);
prefix caching extends the serving engine the same way the scheduler and
allocator do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models import llama
from flash_attention_tpu.serving.engine import Engine
from flash_attention_tpu.serving.native import PagedRuntime
from flash_attention_tpu.serving.prefix import PrefixCache

CFG = llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _greedy_dense(params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits, _, _ = llama.prefill(params,
                                     jnp.asarray(toks, jnp.int32)[None], CFG)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


# --------------------------------------------------------------- allocator
@pytest.mark.parametrize("native", [False, True])
def test_refcounted_pages(native):
    try:
        rt = PagedRuntime(16, 4, 4, native=native)
    except RuntimeError:
        pytest.skip("native runtime unavailable")
    a = rt.seq_alloc(10)                       # 3 pages
    ta = rt.seq_page_table(a, 3)
    assert all(rt.page_refcount(p) == 1 for p in ta)
    assert rt.page_pin(ta[0]) == 0 and rt.page_pin(ta[1]) == 0
    b = rt.seq_alloc_prefixed(11, [ta[0], ta[1]])
    assert b >= 0
    tb = rt.seq_page_table(b, 3)
    assert tb[:2] == ta[:2] and tb[2] != ta[2]
    assert rt.page_refcount(ta[0]) == 3        # seq a + pin + seq b
    rt.seq_free(a)
    assert rt.page_refcount(ta[0]) == 2
    assert rt.page_refcount(ta[2]) == 0        # a's private page freed
    rt.seq_free(b)
    assert rt.page_refcount(ta[0]) == 1        # pin keeps the KV alive
    assert rt.free_pages() == 14
    assert rt.page_unpin(ta[0]) == 0 and rt.page_unpin(ta[1]) == 0
    assert rt.free_pages() == 16
    assert rt.page_unpin(ta[0]) == -1          # double unpin rejected
    assert rt.page_pin(ta[0]) == -1            # pinning a FREE page rejected
    assert rt.seq_alloc_prefixed(8, [ta[0]]) == -1   # adopting a free page
    assert rt.seq_alloc_prefixed(4, [0, 1]) == -1    # more shared than pages
    assert rt.page_refcount(-1) == -1 and rt.page_refcount(99) == -1
    # a failed prefixed alloc must not leak references
    c = rt.seq_alloc(60)                       # 15 of 16 pages
    tc = rt.seq_page_table(c, 15)
    assert rt.page_pin(tc[0]) == 0
    assert rt.seq_alloc_prefixed(40, [tc[0]]) == -1  # needs 9 new, 1 free
    assert rt.page_refcount(tc[0]) == 2


@pytest.mark.parametrize("native", [False, True])
def test_truncate_and_release_respect_sharing(native):
    """Pages shared with another sequence (or pinned) must survive one
    owner's truncate/free."""
    try:
        rt = PagedRuntime(8, 4, 4, native=native)
    except RuntimeError:
        pytest.skip("native runtime unavailable")
    a = rt.seq_alloc(8)                        # 2 pages
    ta = rt.seq_page_table(a, 2)
    assert rt.page_pin(ta[1]) == 0
    b = rt.seq_alloc_prefixed(8, ta)           # fully shared
    assert rt.seq_truncate(b, 4) == 1          # releases its ref on page 1
    assert rt.page_refcount(ta[1]) == 2        # a + pin still hold it
    rt.seq_free(a)
    assert rt.page_refcount(ta[1]) == 1 and rt.page_refcount(ta[0]) == 1
    rt.seq_free(b)
    assert rt.page_refcount(ta[0]) == 0        # b's ref was the last
    assert rt.page_refcount(ta[1]) == 1        # pin remains
    assert rt.free_pages() == 7
    assert rt.page_unpin(ta[1]) == 0
    assert rt.free_pages() == 8


# ---------------------------------------------------------------- registry
def test_prefix_registry_chain_semantics():
    rt = PagedRuntime(16, 4, 4, native=False)
    pc = PrefixCache(rt, page_size=4)
    prompt = list(range(11))                   # 2 full pages + tail
    slot = rt.seq_alloc(len(prompt))
    table = rt.seq_page_table(slot, 3)
    pc.register(prompt, table)
    assert len(pc.by_digest) == 2
    # full hit capped one token short of the context
    assert pc.lookup(prompt, max_tokens=len(prompt) - 1) == table[:2]
    assert pc.lookup(prompt, max_tokens=7) == table[:1]   # cap binds
    # a first-page mismatch kills the whole chain, not just page 0
    other = [99] + prompt[1:]
    assert pc.lookup(other, max_tokens=10) == []
    # same page 0, different page 1: only page 0 hits
    half = prompt[:4] + [99] + prompt[5:]
    assert pc.lookup(half, max_tokens=10) == table[:1]
    # first writer wins: re-registering under another table keeps the pin
    slot2 = rt.seq_alloc(len(prompt))
    pc.register(prompt, rt.seq_page_table(slot2, 3))
    assert len(pc.by_digest) == 2
    assert pc.lookup(prompt, max_tokens=10) == table[:2]
    # eviction only frees registry-only pages
    assert pc.evictable() == 0                 # slot still references them
    rt.seq_free(slot)
    rt.seq_free(slot2)
    assert pc.evictable() == 2
    assert pc.evict(1) == 1 and len(pc.by_digest) == 1


# ------------------------------------------------------------------ engine
def _mk_prompts(rng, shared_len, tails):
    shared = list(map(int, rng.integers(0, 255, shared_len)))
    return [shared + list(map(int, rng.integers(0, 255, t))) for t in tails]


def test_prefix_engine_matches_uncached(params):
    """Sequential requests sharing a 40-token prefix: outputs are bitwise
    the uncached engine's, later requests reuse 2 full pages each, and the
    page pool stays consistent (free + pinned == total - trash)."""
    rng = np.random.default_rng(0)
    prompts = _mk_prompts(rng, 40, (5, 9, 3))

    def run(prefix):
        eng = Engine(CFG, params, total_pages=96, page_size=16, max_batch=4,
                     max_seq_len=256, kv_dtype=jnp.float32,
                     prefix_cache=prefix)
        outs = []
        for p in prompts:      # sequential so later requests can hit
            r = eng.add_request(p, max_new_tokens=6)
            eng.run()
            assert r.error is None
            outs.append(r.output)
        return outs, eng

    base, _ = run(False)
    cached, eng = run(True)
    assert cached == base
    assert eng.stats["prefix_reused_tokens"] == 2 * 2 * 16
    pinned = len(eng.prefix.by_digest)
    assert all(eng.rt.page_refcount(p) == 1
               for p in eng.prefix.by_digest.values())
    assert eng.rt.free_pages() + pinned == eng.rt.total_pages - 1


def test_prefix_engine_concurrent_sharing(params):
    """A request admitted while the prefix owner is still RUNNING adopts its
    pages (refcount > 1 on the shared pages) and both finish correctly."""
    rng = np.random.default_rng(1)
    p1, p2 = _mk_prompts(rng, 48, (3, 7))
    eng = Engine(CFG, params, total_pages=96, page_size=16, max_batch=4,
                 max_seq_len=256, kv_dtype=jnp.float32, prefix_cache=True)
    r1 = eng.add_request(p1, max_new_tokens=12)
    eng.step()                                  # prefill r1, register pages
    eng.step()
    r2 = eng.add_request(p2, max_new_tokens=6)
    eng.step()                                  # admits + prefills r2
    assert r2.cached_tokens == 48 // 16 * 16
    shared_pages = eng.prefix.lookup(p1, 48)
    assert any(eng.rt.page_refcount(p) >= 3 for p in shared_pages)
    eng.run()
    assert r1.output == _greedy_dense(params, p1, 12)
    assert r2.output == _greedy_dense(params, p2, 6)


def test_prefix_eviction_under_pressure(params):
    """More distinct prompts than the pool can cache: admission evicts LRU
    registry-only pages, everything completes, and outputs stay exact."""
    rng = np.random.default_rng(2)
    prompts = [list(map(int, rng.integers(0, 255, 40 + i)))
               for i in range(6)]
    eng = Engine(CFG, params, total_pages=16, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32, prefix_cache=True)
    reqs = [eng.add_request(p, max_new_tokens=4) for p in prompts]
    eng.run()
    assert all(r.error is None for r in reqs)
    for r, p in zip(reqs[:2], prompts[:2]):    # spot-check exactness
        assert r.output == _greedy_dense(params, p, 4)
    assert eng.prefix.evictions > 0
    pinned = len(eng.prefix.by_digest)
    assert eng.rt.free_pages() + pinned == eng.rt.total_pages - 1


def test_prefix_preemption_readmission_reuses_own_pages(params, monkeypatch):
    """A growth-preempted request re-admits by ADOPTING its still-pinned
    prompt pages (both were admitted before any registration, so first-wave
    reuse is zero — any reuse proves the re-admission path) and completes
    identically to an unpressured run."""
    from flash_attention_tpu.serving.scheduler import Scheduler
    preempts = []
    orig = Scheduler.preempt
    monkeypatch.setattr(Scheduler, "preempt",
                        lambda self, req: (preempts.append(req.uid),
                                           orig(self, req))[1])
    rng = np.random.default_rng(3)
    prompts = _mk_prompts(rng, 32, (1, 5))

    def run(total_pages):
        eng = Engine(CFG, params, total_pages=total_pages, page_size=16,
                     max_batch=4, max_seq_len=128, kv_dtype=jnp.float32,
                     prefix_cache=True)
        reqs = [eng.add_request(p, max_new_tokens=60) for p in prompts]
        eng.run()
        assert all(r.error is None for r in reqs)
        return [r.output for r in reqs], eng

    ample, _ = run(64)
    preempts.clear()
    # 11 usable pages: both admit together (6 pages + 4 reserve), then
    # combined growth (+3 pages each) exhausts the pool mid-generation
    tight, eng = run(12)
    assert tight == ample
    assert preempts, "the tight pool was expected to force a preemption"
    assert eng.stats["prefix_reused_tokens"] >= 32


def test_prefix_with_speculative_decoding(params):
    """Prefix caching composes with speculative decoding: the adopted pages
    also hold the draft model's prefix KV, and greedy output stays bitwise
    the dense chain."""
    dcfg = llama.LlamaConfig.tiny(n_layers=1, dim=128, hidden_dim=256,
                                  n_heads=2, n_kv_heads=2)
    dparams = llama.init_params(jax.random.PRNGKey(7), dcfg,
                                dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompts = _mk_prompts(rng, 40, (4, 8))
    eng = Engine(CFG, params, total_pages=96, page_size=16, max_batch=4,
                 max_seq_len=256, kv_dtype=jnp.float32, prefix_cache=True,
                 draft_cfg=dcfg, draft_params=dparams, n_draft=2)
    outs = []
    for p in prompts:
        r = eng.add_request(p, max_new_tokens=8)
        eng.run()
        assert r.error is None
        outs.append(r.output)
    assert eng.stats["prefix_reused_tokens"] >= 2 * 16
    for out, p in zip(outs, prompts):
        assert out == _greedy_dense(params, p, 8)


def test_prefix_rejects_incompatible_modes(params):
    with pytest.raises(ValueError, match="chunked prefill"):
        Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
               max_seq_len=128, kv_dtype=jnp.float32, prefix_cache=True,
               chunk_size=16)


def test_prefix_engine_tensor_parallel_matches_single(params):
    """Prefix caching under a 2-way TP mesh: adopted pages are kv-head-
    sharded like the rest of the cache; generations and reuse accounting
    match the single-device prefix engine exactly."""
    from jax.sharding import Mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("model",))
    rng = np.random.default_rng(6)
    prompts = _mk_prompts(rng, 48, (3, 9))

    def gen(mesh_):
        eng = Engine(CFG, params, total_pages=64, page_size=16, max_batch=2,
                     max_seq_len=128, kv_dtype=jnp.float32, mesh=mesh_,
                     prefix_cache=True)
        outs = []
        for p in prompts:  # sequential so the second adopts the prefix
            r = eng.add_request(p, max_new_tokens=5)
            eng.run()
            assert r.error is None
            outs.append(r.output)
        assert eng.stats["prefix_reused_tokens"] == 48 // 16 * 16
        return outs

    assert gen(mesh) == gen(None)
