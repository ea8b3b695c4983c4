"""Speculative decoding: allocator truncate, chunk commit, acceptance rule,
and engine end-to-end exactness.

The decisive properties (Leviathan et al. rejection sampling):
 - greedy (temp 0) speculative output is BITWISE the plain greedy chain,
   whatever the draft model proposes;
 - with draft == target every proposal is accepted (n_draft+1 tokens/step);
 - emitted tokens are distributed exactly as sequential target samples;
 - preemption + re-admission resumes the identical completion (spec draws
   are keyed by (seed, output position) on dedicated sub-streams).

The reference is a kernel library with no serving layer (SURVEY.md §0);
speculative decoding is part of the serving north star this framework adds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models import llama
from flash_attention_tpu.serving import sampling
from flash_attention_tpu.serving.engine import Engine
from flash_attention_tpu.serving.native import PagedRuntime

CFG = llama.LlamaConfig.tiny()
DRAFT_CFG = llama.LlamaConfig.tiny(n_layers=1, dim=128, hidden_dim=256,
                                   n_heads=2, n_kv_heads=2)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


@pytest.fixture(scope="module")
def draft_params():
    return llama.init_params(jax.random.PRNGKey(7), DRAFT_CFG,
                             dtype=jnp.float32)


def _greedy_dense(params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits, _, _ = llama.prefill(params,
                                     jnp.asarray(toks, jnp.int32)[None], CFG)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


# --------------------------------------------------------------- allocator
@pytest.mark.parametrize("native", [False, True])
def test_seq_truncate(native):
    try:
        rt = PagedRuntime(16, 4, 4, native=native)
    except RuntimeError:
        pytest.skip("native runtime unavailable")
    a = rt.seq_alloc(10)                      # 3 pages
    for _ in range(5):
        assert rt.seq_append(a) == 0          # 15 tokens, 4 pages
    assert rt.seq_num_pages(a) == 4
    assert rt.seq_truncate(a, 9) == 1         # back to 3 pages
    assert rt.seq_length(a) == 9 and rt.seq_num_pages(a) == 3
    assert rt.free_pages() == 13
    assert rt.seq_truncate(a, 9) == 0         # no-op at the boundary
    assert rt.seq_truncate(a, 10) == -1       # growing is rejected
    assert rt.seq_truncate(a, -1) == -1
    assert rt.seq_truncate(99, 1) == -1       # bad slot
    assert rt.seq_truncate(a, 0) == 3         # to zero frees everything
    assert rt.seq_length(a) == 0 and rt.free_pages() == 16
    rt.seq_free(a)


# ------------------------------------------------------------ chunk commit
@pytest.mark.parametrize("quant", [False, True])
def test_write_chunk_to_pages_matches_token_scatters(quant):
    """The batched token-granular chunk commit must equal a loop of the
    decode path's per-token page-tile scatters."""
    rng = np.random.default_rng(3)
    L, b, c, hk, hd = 2, 3, 4, 2, 8
    ps, P, npp = 128 if quant else 8, 12, 3
    dtype = jnp.int8 if quant else jnp.float32
    kp = jnp.zeros((L, hk, P, ps, hd), dtype)
    vp = jnp.zeros_like(kp)
    ksc = vsc = None
    if quant:
        ksc = jnp.ones((L, hk, P, 8, 128), jnp.float32)
        vsc = jnp.ones_like(ksc)
    ks = jnp.asarray(rng.standard_normal((L, b, c, hk, hd)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, b, c, hk, hd)), jnp.float32)
    done = jnp.asarray([1, ps - 2, 5], jnp.int32)   # mid-page + page-crossing
    clen = jnp.full((b,), c, jnp.int32)
    tables = jnp.asarray(rng.permutation(P - 1)[: b * npp].reshape(b, npp)
                         + 1, jnp.int32)
    got = llama.write_chunk_to_pages(kp.copy(), vp.copy(), (ks, vs), done,
                                     clen, tables,
                                     None if not quant else ksc.copy(),
                                     None if not quant else vsc.copy())
    # oracle: the decode write path, one token at a time
    okp, ovp = kp.copy(), vp.copy()
    oks = ksc.copy() if quant else None
    ovs = vsc.copy() if quant else None
    kv_write = jax.vmap(llama._scatter_token_kv, in_axes=(0, None, None, 0))
    sc_write = jax.vmap(llama._scatter_token_scale,
                        in_axes=(0, None, None, 0))
    for j in range(c):
        posn = done + j
        wpage = jnp.take_along_axis(tables,
                                    jnp.clip(posn // ps, 0, npp - 1)[:, None],
                                    axis=1)[:, 0]
        woff = posn % ps
        kj, vj = ks[:, :, j], vs[:, :, j]
        if quant:
            kj, s = llama._quantize_token(kj, dtype)
            oks = sc_write(oks, wpage, woff, s)
            vj, s = llama._quantize_token(vj, dtype)
            ovs = sc_write(ovs, wpage, woff, s)
        okp = kv_write(okp, wpage, woff, kj)
        ovp = kv_write(ovp, wpage, woff, vj)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(okp))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ovp))
    if quant:
        # scales at ~1e-9: jit-vs-eager fusion reorders the amax/divide
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(oks),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got[3]), np.asarray(ovs),
                                   rtol=1e-6)


# ------------------------------------------------------------- accept rule
def test_spec_accept_greedy_prefix():
    """Greedy acceptance keeps exactly the proposals matching the target
    argmax chain and corrects the first mismatch to the target argmax."""
    v, g = 16, 3
    rng = np.random.default_rng(0)
    tl = jnp.asarray(rng.standard_normal((1, g + 1, v)), jnp.float32)
    argmax = np.argmax(np.asarray(tl[0]), -1)           # target chain
    for n_match in range(g + 1):
        d = argmax[:g].copy()
        if n_match < g:
            d[n_match] = (d[n_match] + 1) % v           # first mismatch here
        dt = jnp.asarray(d[None], jnp.int32)
        dl = jnp.asarray(rng.standard_normal((1, g, v)), jnp.float32)
        out, n_emit = sampling.spec_accept(
            tl, dl, dt, jnp.zeros((1,)), jnp.asarray([5], jnp.int32),
            jnp.asarray([2], jnp.int32))
        assert int(n_emit[0]) == n_match + 1
        np.testing.assert_array_equal(np.asarray(out[0, : n_match + 1]),
                                      argmax[: n_match + 1])


def test_spec_accept_distribution_exact():
    """Empirical distribution of the first emitted token must match the
    target softmax whatever the draft distribution (the whole point of
    rejection sampling). Single fixed (target, draft) pair, many seeds."""
    v, g, n = 8, 2, 4000
    rng = np.random.default_rng(1)
    tl = jnp.asarray(np.broadcast_to(
        rng.standard_normal((1, g + 1, v)), (n, g + 1, v)), jnp.float32)
    dl = jnp.asarray(np.broadcast_to(
        rng.standard_normal((1, g, v)), (n, g, v)), jnp.float32)
    temps = jnp.ones((n,), jnp.float32)
    seeds = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.full((n,), 3, jnp.int32)
    # draft tokens drawn from the draft's own distribution, as in serving
    d0 = sampling.draft_sample(dl[:, 0], temps, seeds, pos)
    d1 = sampling.draft_sample(dl[:, 1], temps, seeds, pos + 1)
    dt = jnp.stack([d0, d1], axis=1)
    out, _ = sampling.spec_accept(tl, dl, dt, temps, seeds, pos)
    first = np.asarray(out[:, 0])
    want = np.asarray(jax.nn.softmax(tl[0, 0]))
    got = np.bincount(first, minlength=v) / n
    tv = 0.5 * np.abs(got - want).sum()
    assert tv < 0.04, (tv, got, want)


# ------------------------------------------------------------------ engine
def test_spec_engine_greedy_matches_dense(params, draft_params):
    """Greedy speculative output is bitwise the plain greedy chain, with a
    draft model that knows nothing about the target."""
    eng = Engine(CFG, params, total_pages=96, page_size=16, max_batch=4,
                 max_seq_len=256, kv_dtype=jnp.float32,
                 draft_cfg=DRAFT_CFG, draft_params=draft_params, n_draft=3)
    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(0, 255, size=n)))
               for n in (5, 23, 17)]
    reqs = [eng.add_request(p, max_new_tokens=9) for p in prompts]
    done = eng.run()
    assert len(done) == 3
    for req, prompt in zip(reqs, prompts):
        want = _greedy_dense(params, prompt, 9)
        assert req.output == want, (req.output, want)
    s = eng.stats
    assert s["spec_steps"] > 0
    assert 0 <= s["spec_accepted"] <= s["spec_proposed"]
    # all pages returned (only the trash sequence remains)
    assert eng.rt.free_pages() == eng.rt.total_pages - 1


def test_spec_engine_draft_equals_target_accepts_all(params):
    """With draft == target every proposal is accepted: a request needing
    k*(g+1) tokens finishes in exactly k spec steps."""
    g = 3
    eng = Engine(CFG, params, total_pages=96, page_size=16, max_batch=2,
                 max_seq_len=256, kv_dtype=jnp.float32,
                 draft_cfg=CFG, draft_params=params, n_draft=g)
    req = eng.add_request([5, 9, 2], max_new_tokens=1 + 2 * (g + 1),
                          temperature=0.7, seed=13)
    eng.run()
    assert req.error is None and len(req.output) == 1 + 2 * (g + 1)
    assert eng.stats["spec_steps"] == 2
    assert eng.stats["spec_accepted"] == 2 * g
    # determinism: an identical engine reproduces the identical completion
    eng2 = Engine(CFG, params, total_pages=96, page_size=16, max_batch=2,
                  max_seq_len=256, kv_dtype=jnp.float32,
                  draft_cfg=CFG, draft_params=params, n_draft=g)
    req2 = eng2.add_request([5, 9, 2], max_new_tokens=1 + 2 * (g + 1),
                            temperature=0.7, seed=13)
    eng2.run()
    assert req2.output == req.output


def test_spec_engine_survives_preemption(params, draft_params):
    """Page pressure mid-generation preempts and re-admits; the completion
    must be IDENTICAL to an unpressured run (spec draws are keyed by
    (seed, output position), and re-admission resumes at the kept frontier).
    """
    def run(total_pages):
        eng = Engine(CFG, params, total_pages=total_pages, page_size=16,
                     max_batch=4, max_seq_len=192, kv_dtype=jnp.float32,
                     draft_cfg=DRAFT_CFG, draft_params=draft_params,
                     n_draft=2)
        rng = np.random.default_rng(2)
        prompts = [list(map(int, rng.integers(0, 255, size=n)))
                   for n in (40, 37, 45)]
        reqs = [eng.add_request(p, max_new_tokens=12, temperature=0.9,
                                seed=100 + i)
                for i, p in enumerate(prompts)]
        eng.run()
        assert all(r.error is None for r in reqs)
        return [r.output for r in reqs], eng
    ample, _ = run(total_pages=64)
    tight, eng = run(total_pages=16)   # 15 usable pages = 240 tokens: the 3
    # sequences (52-57 each + spec slack) cannot all stay resident
    assert tight == ample
    assert eng.rt.free_pages() == eng.rt.total_pages - 1


def test_spec_engine_eos_mid_acceptance(params):
    """EOS emitted inside an accepted run stops the output at the EOS token
    even when later proposals were also accepted."""
    g = 4
    eng = Engine(CFG, params, total_pages=64, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32,
                 draft_cfg=CFG, draft_params=params, n_draft=g)
    probe = eng.add_request([1, 2, 3], max_new_tokens=g + 1)
    eng.run()
    assert len(probe.output) == g + 1
    eos = probe.output[2]   # a token known to appear at output index 2
    eng2 = Engine(CFG, params, total_pages=64, page_size=16, max_batch=2,
                  max_seq_len=128, kv_dtype=jnp.float32,
                  draft_cfg=CFG, draft_params=params, n_draft=g)
    req = eng2.add_request([1, 2, 3], max_new_tokens=20, eos_id=eos)
    eng2.run()
    assert req.output == probe.output[:3]
    assert eng2.rt.free_pages() == eng2.rt.total_pages - 1


def test_spec_engine_quantized_kv(params, draft_params):
    """Speculative decoding over the int8 paged cache: runs end to end and
    the greedy output tracks the fp cache's (quantization may perturb late
    tokens; require the first few to agree)."""
    kw = dict(total_pages=48, page_size=128, max_batch=2, max_seq_len=512,
              draft_cfg=DRAFT_CFG, draft_params=draft_params, n_draft=2)
    fp = Engine(CFG, params, kv_dtype=jnp.float32, **kw)
    q8 = Engine(CFG, params, kv_quant=True, **kw)
    prompt = list(range(10, 40))
    r_fp = fp.add_request(prompt, max_new_tokens=6)
    r_q8 = q8.add_request(prompt, max_new_tokens=6)
    fp.run()
    q8.run()
    assert r_fp.error is None and r_q8.error is None
    assert r_q8.output[:3] == r_fp.output[:3], (r_q8.output, r_fp.output)


def test_spec_engine_rejects_filters_and_bad_configs(params, draft_params):
    eng = Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
                 max_seq_len=128, kv_dtype=jnp.float32,
                 draft_cfg=DRAFT_CFG, draft_params=draft_params, n_draft=2)
    with pytest.raises(ValueError, match="top-k/top-p"):
        eng.add_request([1, 2], 4, temperature=0.5, top_k=5)
    with pytest.raises(ValueError, match="come together"):
        Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
               max_seq_len=128, kv_dtype=jnp.float32, draft_cfg=DRAFT_CFG)
    with pytest.raises(ValueError, match="vocab"):
        bad = llama.LlamaConfig.tiny(vocab_size=128)
        Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
               max_seq_len=128, kv_dtype=jnp.float32, draft_cfg=bad,
               draft_params=draft_params, n_draft=2)


def test_spec_engine_tensor_parallel_matches_single(params, draft_params):
    """Speculative decoding under a 2-way TP mesh: the rollout's decode core
    runs kv-head-local with replicated post-psum logits (every shard draws
    the same draft token), verification goes through tp_prefill_chunk, and
    the generations match the single-device spec engine exactly."""
    from jax.sharding import Mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("model",))
    rng = np.random.default_rng(5)
    prompts = [list(map(int, rng.integers(0, 255, size=n)))
               for n in (8, 21)]

    def gen(mesh_):
        eng = Engine(CFG, params, total_pages=64, page_size=16, max_batch=2,
                     max_seq_len=128, kv_dtype=jnp.float32, mesh=mesh_,
                     draft_cfg=DRAFT_CFG, draft_params=draft_params,
                     n_draft=2)
        reqs = [eng.add_request(p, max_new_tokens=7, temperature=0.8,
                                seed=40 + i) for i, p in enumerate(prompts)]
        eng.run()
        assert all(r.error is None for r in reqs)
        return [r.output for r in reqs]

    assert gen(mesh) == gen(None)
