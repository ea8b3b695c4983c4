"""Forward-kernel parity suite vs the pure-JAX oracle.

Mirrors the reference's dense parity suite structure
(``/root/reference/test_flash_attn.py:345-554``): GQA pairs, causal both ways,
and a (seqlen_q, seqlen_k) matrix deliberately hitting block boundaries ±1,
cross shapes, and degenerate sizes — at the reference's tolerance gates.
"""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_tpu import fwd
from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.utils import debug_inputs
from flash_attention_tpu.utils.metrics import assert_metrics

# Forward-only gates: the reference gates O with the same thresholds as grads
# (test_flash_attn.py:407-414).
FWD_TOLS = {"atol": 5e-3, "mean_atol": 2e-4, "mean_rtol": 1e-2}
LSE_TOLS = {"atol": 1e-2, "mean_atol": 1e-3, "mean_rtol": 1e-2}

# Boundary-hunting shape matrix (subset of the reference's ~75 pairs,
# test_flash_attn.py:261-343; trimmed for interpret-mode runtime).
SEQLEN_PAIRS = [
    (128, 128),
    (256, 256),
    (512, 512),
    (1, 1),
    (1, 2),
    (64, 1),
    (63, 63),
    (65, 65),
    (127, 128),
    (128, 127),
    (129, 129),
    (257, 129),
    (129, 257),
    (512, 256),
    (256, 512),
    (384, 640),
    (640, 384),
    (961, 1024),
    # near-boundary stress around the reference's hot spots
    # (test_flash_attn.py:261-343): 1023/1025 block edges, 897-961 x 1024,
    # extreme cross shapes, and sizes just over the default 1024 block
    (1023, 1023),
    (1025, 1025),
    (1024, 1023),
    (1023, 1024),
    (897, 1024),
    (959, 1024),
    (960, 1024),
    (1, 1024),
    (1024, 1),
    (1025, 63),
    (63, 1025),
]


def _make_qkv(key, b, sq, sk, h, hk, d, dtype):
    if debug_inputs.identity_inputs_enabled():
        # FAT_IDENTITY_INPUTS=1: one-hot rows instead of noise so a failure's
        # FAT_FAIL_DUMP reads as a pattern (reference's use_identity_inputs,
        # test_flash_attn.py:74-109)
        return (debug_inputs.identity_batch(b, sq, h, d, dtype),
                debug_inputs.identity_batch(b, sk, hk, d, dtype),
                debug_inputs.identity_batch(b, sk, hk, d, dtype))
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype=dtype)
    k = jax.random.normal(kk, (b, sk, hk, d), dtype=dtype)
    v = jax.random.normal(kv, (b, sk, hk, d), dtype=dtype)
    return q, k, v


@pytest.mark.parametrize("head_dim", [64, 128])
@pytest.mark.parametrize("seqlen_q,seqlen_k", SEQLEN_PAIRS)
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_parity(seqlen_q, seqlen_k, causal, head_dim):
    q, k, v = _make_qkv(
        jax.random.PRNGKey(0), 2, seqlen_q, seqlen_k, 4, 4, head_dim,
        jnp.float16
    )
    o, lse = fwd(q, k, v, is_causal=causal)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    tag = f"{seqlen_q},{seqlen_k},causal={causal},d={head_dim}"
    assert_metrics(f"o[{tag}]", o, o_ref, FWD_TOLS)
    assert_metrics(f"lse[{tag}]", lse, lse_ref, LSE_TOLS)


# subset for the batch/bf16 axes (full matrix x batch x dtype would blow
# interpret-mode runtime; the reference runs batch {1,3} over its full matrix,
# test_flash_attn.py:255)
BOUNDARY_PAIRS = [
    (1, 1), (63, 63), (127, 128), (129, 257), (640, 384), (1023, 1023),
    (960, 1024), (1025, 63),
]


@pytest.mark.parametrize("batch", [1, 3])
@pytest.mark.parametrize("seqlen_q,seqlen_k", BOUNDARY_PAIRS)
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_batch(batch, seqlen_q, seqlen_k, causal):
    q, k, v = _make_qkv(
        jax.random.PRNGKey(7), batch, seqlen_q, seqlen_k, 4, 2, 128,
        jnp.float16
    )
    o, lse = fwd(q, k, v, is_causal=causal)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    tag = f"b={batch},{seqlen_q},{seqlen_k},causal={causal}"
    assert_metrics(f"o[{tag}]", o, o_ref, FWD_TOLS)
    assert_metrics(f"lse[{tag}]", lse, lse_ref, LSE_TOLS)


# bf16 is the TPU performance dtype the benchmarks run in; gate it across the
# boundary subset too (3 fewer mantissa bits than fp16 -> 8x looser gates)
BF16_TOLS = {"atol": 4e-2, "mean_atol": 2e-3, "mean_rtol": 5e-2}


@pytest.mark.parametrize("seqlen_q,seqlen_k", BOUNDARY_PAIRS)
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_parity_bf16(seqlen_q, seqlen_k, causal):
    q, k, v = _make_qkv(
        jax.random.PRNGKey(8), 2, seqlen_q, seqlen_k, 4, 2, 128, jnp.bfloat16
    )
    o, lse = fwd(q, k, v, is_causal=causal)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    tag = f"bf16,{seqlen_q},{seqlen_k},causal={causal}"
    assert_metrics(f"o[{tag}]", o, o_ref.astype(jnp.bfloat16), BF16_TOLS)
    assert_metrics(f"lse[{tag}]", lse, lse_ref,
                   {"atol": 5e-2, "mean_atol": 5e-3, "mean_rtol": 5e-2})


@pytest.mark.parametrize("nheads,nheads_k", [(2, 1), (4, 2), (6, 3), (6, 1)])
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_gqa(nheads, nheads_k, causal):
    q, k, v = _make_qkv(
        jax.random.PRNGKey(1), 2, 192, 384, nheads, nheads_k, 64, jnp.float16
    )
    o, lse = fwd(q, k, v, is_causal=causal)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    assert_metrics(f"o[gqa {nheads}/{nheads_k}]", o, o_ref, FWD_TOLS)
    assert_metrics(f"lse[gqa {nheads}/{nheads_k}]", lse, lse_ref, LSE_TOLS)


# GQA x boundary-shape interaction (VERDICT r2 missing #1): the reference runs
# all its GQA pairs across the full seqlen matrix (test_flash_attn.py:255-343);
# grouped-head dispatch meeting ragged/boundary tails is exactly what that
# cross-product exists to catch. (4, 2) already rides BOUNDARY_PAIRS via
# test_fwd_batch; cover the remaining pairs incl. both MQA extremes here.
@pytest.mark.parametrize("nheads,nheads_k", [(2, 1), (6, 3), (6, 1)])
@pytest.mark.parametrize("seqlen_q,seqlen_k", BOUNDARY_PAIRS)
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_gqa_boundary(nheads, nheads_k, seqlen_q, seqlen_k, causal):
    q, k, v = _make_qkv(
        jax.random.PRNGKey(11), 2, seqlen_q, seqlen_k, nheads, nheads_k, 128,
        jnp.float16
    )
    o, lse = fwd(q, k, v, is_causal=causal)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    tag = f"gqa {nheads}/{nheads_k},{seqlen_q},{seqlen_k},causal={causal}"
    assert_metrics(f"o[{tag}]", o, o_ref, FWD_TOLS)
    assert_metrics(f"lse[{tag}]", lse, lse_ref, LSE_TOLS)


@pytest.mark.parametrize("head_dim", [64, 128])
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_head_dim(head_dim, causal):
    q, k, v = _make_qkv(
        jax.random.PRNGKey(2), 1, 256, 256, 2, 2, head_dim, jnp.float16
    )
    o, lse = fwd(q, k, v, is_causal=causal)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    assert_metrics(f"o[d={head_dim}]", o, o_ref, FWD_TOLS)
    assert_metrics(f"lse[d={head_dim}]", lse, lse_ref, LSE_TOLS)


def test_fwd_bf16():
    q, k, v = _make_qkv(jax.random.PRNGKey(3), 1, 256, 256, 2, 2, 128, jnp.bfloat16)
    o, _ = fwd(q, k, v, is_causal=True)
    o_ref, _ = reference_attention(q, k, v, causal=True)
    # bf16 has ~3 fewer mantissa bits than fp16 -> looser gates
    assert_metrics(
        "o[bf16]", o, o_ref.astype(jnp.bfloat16),
        {"atol": 4e-2, "mean_atol": 2e-3, "mean_rtol": 5e-2},
    )


def test_fwd_fully_masked_rows():
    # causal with seqlen_q > seqlen_k: top rows fully masked (lower-right
    # alignment) -> O = 0, LSE = 0 (flash_fwd_kernel.h:717-730 semantics).
    q, k, v = _make_qkv(jax.random.PRNGKey(4), 1, 200, 64, 2, 2, 64, jnp.float16)
    o, lse = fwd(q, k, v, is_causal=True)
    n_masked = 200 - 64
    assert jnp.all(o[:, :n_masked] == 0.0), "fully-masked rows must output 0"
    assert jnp.all(lse[:, :, :n_masked] == 0.0), "fully-masked rows must have LSE 0"
    o_ref, lse_ref = reference_attention(q, k, v, causal=True)
    assert_metrics("o[masked rows]", o, o_ref, FWD_TOLS)
    assert_metrics("lse[masked rows]", lse, lse_ref, LSE_TOLS)


def test_fwd_custom_scale():
    q, k, v = _make_qkv(jax.random.PRNGKey(5), 1, 128, 128, 2, 2, 64, jnp.float16)
    o, _ = fwd(q, k, v, is_causal=False, sm_scale=0.5)
    o_ref, _ = reference_attention(q, k, v, causal=False, sm_scale=0.5)
    assert_metrics("o[scale]", o, o_ref, FWD_TOLS)


# ---- long-KV chunked forward (attention.KV_SPLIT) ----
# Above KV_SPLIT the auto-configured forward chunks the kv axis into
# one-shot-sized pieces merged with the online-softmax LSE merge; kv_split
# forces a tiny threshold so the path runs at interpret-mode shapes,
# including ragged last chunks, causal (per-chunk right-window rewrite),
# cross shapes with fully-dead rows, and GQA.
KV_SPLIT_CASES = [
    # (sq, sk, kv_split, causal)
    (256, 640, 256, False),   # ragged last chunk
    (256, 640, 256, True),
    (512, 512, 128, True),    # square causal, 4 chunks
    (640, 384, 128, True),    # sq > sk: top rows dead in EVERY chunk
    (129, 257, 128, True),    # off-by-one boundaries
    (384, 1024, 512, False),
]


@pytest.mark.parametrize("sq,sk,kv_split,causal", KV_SPLIT_CASES)
def test_fwd_kv_split_parity(sq, sk, kv_split, causal):
    q, k, v = _make_qkv(jax.random.PRNGKey(11), 2, sq, sk, 4, 2, 128,
                        jnp.float16)
    o, lse = fwd(q, k, v, is_causal=causal, kv_split=kv_split)
    # the unsplit kernel is itself gated against the oracle; compare to the
    # oracle directly so this also covers the merge numerics
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    tag = f"kvsplit[{sq},{sk},{kv_split},causal={causal}]"
    assert_metrics(f"o[{tag}]", o, o_ref, FWD_TOLS)
    assert_metrics(f"lse[{tag}]", lse, lse_ref, LSE_TOLS)
    assert bool(jnp.all(jnp.isfinite(lse)))


def test_fwd_kv_split_matches_unsplit_bitwise_dead_rows():
    # sq > sk causal: rows 0..sq-sk-1 attend nothing. The chunked path must
    # restore the public sentinel (O = 0, lse = empty_lse) exactly.
    q, k, v = _make_qkv(jax.random.PRNGKey(3), 1, 640, 384, 4, 4, 128,
                        jnp.float16)
    o, lse = fwd(q, k, v, is_causal=True, kv_split=128)
    dead = 640 - 384
    assert bool(jnp.all(o[:, :dead] == 0.0))
    assert bool(jnp.all(lse[:, :, :dead] == 0.0))
