"""Multi-step decode (Engine(decode_block=k)): k decode steps per dispatch.

The exactness contract: the emitted token stream is BITWISE the single-step
engine's for every sampling mode and stop condition — multi-step only
changes how many tokens arrive per host round-trip, never which tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models import llama
from flash_attention_tpu.serving.engine import Engine

CFG = llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _run(params, prompts, max_new, *, decode_block=1, engine_kw=None,
         req_kw=None):
    kw = dict(total_pages=96, page_size=16, max_batch=4, max_seq_len=256,
              kv_dtype=jnp.float32)
    kw.update(engine_kw or {})
    eng = Engine(CFG, params, decode_block=decode_block, **kw)
    reqs = [eng.add_request(p, max_new_tokens=max_new, **(rk or {}))
            for p, rk in zip(prompts, req_kw or [{}] * len(prompts))]
    done = eng.run(max_steps=500)
    assert len(done) == len(reqs)
    return reqs, eng


def test_multistep_greedy_bitwise(params):
    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(0, 255, size=n)))
               for n in (5, 23, 17)]
    base, _ = _run(params, prompts, 7)
    for k in (2, 4):
        multi, _ = _run(params, prompts, 7, decode_block=k)
        for a, b in zip(base, multi):
            assert a.output == b.output, (k, a.output, b.output)


def test_multistep_sampled_bitwise(params):
    """Temperature / top-k / top-p / seeds: the (seed, position)-pure keys
    make multi-step draws identical to single-step's."""
    rng = np.random.default_rng(1)
    prompts = [list(map(int, rng.integers(0, 255, size=n))) for n in (9, 14)]
    req_kw = [dict(temperature=0.8, top_k=50, seed=7),
              dict(temperature=1.1, top_p=0.9, seed=3)]
    base, _ = _run(params, prompts, 9, req_kw=req_kw)
    multi, _ = _run(params, prompts, 9, decode_block=4, req_kw=req_kw)
    for a, b in zip(base, multi):
        assert a.output == b.output


def test_multistep_stop_mid_block(params):
    """A stop token hit at step j < k discards the block's tail — exactly
    the single-step truncation."""
    probe, _ = _run(params, [[1, 2, 3]], 8)
    stop = probe[0].output[3]
    base, _ = _run(params, [[1, 2, 3]], 8,
                   req_kw=[dict(stop_ids={stop, 99999})])
    multi, _ = _run(params, [[1, 2, 3]], 8, decode_block=4,
                    req_kw=[dict(stop_ids={stop, 99999})])
    assert multi[0].output == base[0].output == probe[0].output[:4]


def test_multistep_max_new_not_multiple_of_block(params):
    rng = np.random.default_rng(2)
    prompt = list(map(int, rng.integers(0, 255, size=11)))
    base, _ = _run(params, [prompt], 5)
    multi, _ = _run(params, [prompt], 5, decode_block=4)
    assert multi[0].output == base[0].output
    assert len(multi[0].output) == 5


def test_multistep_kv_quant(params):
    rng = np.random.default_rng(3)
    prompt = list(map(int, rng.integers(0, 255, size=19)))
    ekw = dict(total_pages=16, page_size=128, max_batch=2, kv_quant=True)
    base, _ = _run(params, [prompt], 6, engine_kw=ekw)
    multi, _ = _run(params, [prompt], 6, decode_block=3, engine_kw=ekw)
    assert multi[0].output == base[0].output


def test_multistep_logprobs(params):
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    base, _ = _run(params, [prompt], 5, req_kw=[dict(logprobs=True)])
    multi, _ = _run(params, [prompt], 5, decode_block=2,
                    req_kw=[dict(logprobs=True)])
    assert multi[0].output == base[0].output
    np.testing.assert_allclose(multi[0].token_logprobs,
                               base[0].token_logprobs, atol=1e-5)


def test_multistep_survives_preemption(params):
    """Tight page pool forces preemption mid-generation; the truncated
    reservation + kept-output recompute still yields the uninterrupted
    completion (the spec-decode resume property, inherited via
    seq_truncate)."""
    rng = np.random.default_rng(4)
    p1 = list(map(int, rng.integers(0, 255, size=30)))
    p2 = list(map(int, rng.integers(0, 255, size=30)))
    kw = [dict(temperature=0.9, top_k=64, seed=11), {}]
    alone, _ = _run(params, [p1], 40, req_kw=kw[:1],
                    engine_kw=dict(total_pages=32, max_batch=2,
                                   max_seq_len=96))
    contended, _ = _run(params, [p1, p2], 40, decode_block=4, req_kw=kw,
                        engine_kw=dict(total_pages=10, max_batch=2,
                                       max_seq_len=96))
    assert contended[0].output == alone[0].output
    base2, _ = _run(params, [p2], 40,
                    engine_kw=dict(total_pages=32, max_batch=2,
                                   max_seq_len=96))
    assert contended[1].output == base2[0].output


def test_multistep_rejects_spec_combination(params):
    with pytest.raises(ValueError, match="decode_block"):
        Engine(CFG, params, total_pages=32, page_size=16, max_batch=2,
               max_seq_len=128, kv_dtype=jnp.float32, decode_block=2,
               draft_cfg=CFG, draft_params=params)


def test_multistep_tensor_parallel_matches_single(params):
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    rng = np.random.default_rng(5)
    prompts = [list(map(int, rng.integers(0, 255, size=n))) for n in (8, 21)]
    base, _ = _run(params, prompts, 6)
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("model",))
    multi, _ = _run(params, prompts, 6, decode_block=3,
                    engine_kw=dict(mesh=mesh))
    for a, b in zip(base, multi):
        assert a.output == b.output


def test_multistep_fewer_dispatches(params):
    """The point of the feature: k tokens per decode dispatch."""
    rng = np.random.default_rng(6)
    prompt = list(map(int, rng.integers(0, 255, size=7)))
    _, eng = _run(params, [prompt], 9, decode_block=4)
    # prefill emits token 1; decode emits the other 8 in ceil(8/4) = 2
    # dispatches instead of 8
    assert eng.stats["decode_steps"] == 2
    assert eng.stats["decode_tokens"] == 8
