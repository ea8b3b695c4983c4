#!/usr/bin/env python
"""Compiled-on-chip smoke for logit soft-capping + the Gemma-2 model stack.

The softcap suite runs in interpret mode on CPU (tests/test_softcap.py,
tests/test_gemma.py); this catches Mosaic-vs-interpret gaps on the real chip
(round-2 lesson): the tanh on the score tile in fwd, the 1 - tanh² dS factor
in both bwd kernels, the paged-decode cap (incl. after fused int8 scales),
and one tiny Gemma-2 prefill-vs-decode consistency pass.
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flash_attention_tpu import flash_attention, fwd
from flash_attention_tpu.ops.paged_attention import (paged_attention,
                                                     paged_attention_reference)
from flash_attention_tpu.ops.reference import reference_attention


def check(tag, sq, sk, causal, softcap, window=None, dtype=jnp.bfloat16):
    kq, kk, kv, kd = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (2, sq, 4, 128), dtype)
    k = jax.random.normal(kk, (2, sk, 4, 128), dtype)
    v = jax.random.normal(kv, (2, sk, 4, 128), dtype)
    do = jax.random.normal(kd, q.shape, dtype)

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=causal, window_size=window,
                            softcap=softcap)
        return jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32))

    def loss_ref(q, k, v):
        o, _ = reference_attention(q, k, v, causal=causal, window=window,
                                   softcap=softcap)
        return jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32))

    o, lse = fwd(q, k, v, is_causal=causal, window_size=window,
                 softcap=softcap)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal,
                                         window=window, softcap=softcap)
    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
            for a, b in zip((o, lse) + grads, (o_ref, lse_ref) + grads_ref)]
    names = ("O", "LSE", "dQ", "dK", "dV")
    tol = 6e-2 if dtype == jnp.bfloat16 else 2e-3
    ok = all(e < tol for e in errs)
    print(f"{tag:36s} " + " ".join(f"{n}={e:.2e}" for n, e in
                                   zip(names, errs))
          + ("  OK" if ok else f"  FAIL (tol {tol})"), flush=True)
    return ok


def check_paged(quantized):
    b, h, hk, d, page_size, pps = 4, 8, 4, 128, 128, 8
    total_pages = b * pps + 1
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, d), jnp.bfloat16)
    kp = jax.random.normal(ks[1], (hk, total_pages, page_size, d),
                           jnp.bfloat16)
    vp = jax.random.normal(ks[2], (hk, total_pages, page_size, d),
                           jnp.bfloat16)
    k_scales = v_scales = None
    if quantized:
        kp = jnp.clip(jnp.round(kp.astype(jnp.float32) * 40), -127,
                      127).astype(jnp.int8)
        vp = jnp.clip(jnp.round(vp.astype(jnp.float32) * 40), -127,
                      127).astype(jnp.int8)
        k_scales = jnp.broadcast_to(
            jax.random.uniform(ks[3], (hk, total_pages, 1, 128),
                               jnp.float32, 0.01, 0.05),
            (hk, total_pages, 8, 128))
        v_scales = k_scales
    lengths = jnp.array([5, 700, 1024, 130], jnp.int32)
    tables = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    o = paged_attention(q, kp, vp, lengths, tables, k_scales=k_scales,
                        v_scales=v_scales, softcap=10.0)
    o_ref = paged_attention_reference(q, kp, vp, lengths, tables,
                                      k_scales=k_scales, v_scales=v_scales,
                                      softcap=10.0)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    ok = err < 6e-2
    print(f"paged softcap quant={quantized}: err={err:.2e}"
          + ("  OK" if ok else "  FAIL"), flush=True)
    return ok


def check_gemma():
    from flash_attention_tpu.models.llama import (LlamaConfig, decode_step,
                                                  init_params, prefill)
    cfg = LlamaConfig.tiny_gemma2(n_layers=4)
    params = init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    b, s, pps = 2, 96, 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.vocab_size)
    logits, ks, vs = prefill(params, tokens, cfg)
    L, hk, hd = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    total = b * pps + 1
    k_pages = jnp.zeros((L, hk, total, 128, hd), jnp.bfloat16)
    v_pages = jnp.zeros_like(k_pages)
    tables = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    for i in range(b):
        k_pages = k_pages.at[:, :, tables[i, 0], :s].set(
            ks[:, i].transpose(0, 2, 1, 3))
        v_pages = v_pages.at[:, :, tables[i, 0], :s].set(
            vs[:, i].transpose(0, 2, 1, 3))
    nxt = jax.random.randint(jax.random.PRNGKey(2), (b,), 0, cfg.vocab_size)
    dl, *_ = decode_step(params, k_pages, v_pages, None, None, nxt,
                         jnp.full((b,), s + 1, jnp.int32), tables,
                         tables[:, 0], jnp.full((b,), s, jnp.int32), cfg)
    pl2, _, _ = prefill(params,
                        jnp.concatenate([tokens, nxt[:, None]], 1), cfg)
    err = float(jnp.max(jnp.abs(dl - pl2[:, -1])))
    ok = err < 5e-2  # bf16 model; logits capped at 30
    print(f"gemma2 prefill-vs-decode: err={err:.2e}"
          + ("  OK" if ok else "  FAIL"), flush=True)
    return ok


def main():
    ok = True
    ok &= check("cap=50 causal 1024", 1024, 1024, True, 50.0)
    ok &= check("cap=5 dense 2048", 2048, 2048, False, 5.0)
    ok &= check("cap=20 + w=(256,0) 1024", 1024, 1024, True, 20.0, (256, 0))
    ok &= check("cap=30 sq!=sk 897x1024", 897, 1024, True, 30.0)
    ok &= check("f32 cap=50 causal 1024", 1024, 1024, True, 50.0,
                dtype=jnp.float32)
    ok &= check_paged(False)
    ok &= check_paged(True)
    ok &= check_gemma()
    print("softcap on-chip smoke:", "ALL OK" if ok else "FAILURES",
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
