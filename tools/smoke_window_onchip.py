#!/usr/bin/env python
"""Compiled-on-chip smoke for sliding-window attention (fwd+bwd+varlen).

Runs a handful of window configs COMPILED on the real TPU and checks the
6-metric-style max-abs error vs the dense oracle. The full window suite runs
in interpret mode on CPU (tests/test_window.py); this catches
Mosaic-vs-interpret gaps (round-2 lesson: nothing counts as verified until
compiled on-chip).
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flash_attention_tpu import flash_attention, fwd
from flash_attention_tpu.ops.reference import reference_attention


def check(tag, sq, sk, window, causal, dtype=jnp.bfloat16):
    kq, kk, kv, kd = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (2, sq, 4, 128), dtype)
    k = jax.random.normal(kk, (2, sk, 4, 128), dtype)
    v = jax.random.normal(kv, (2, sk, 4, 128), dtype)
    do = jax.random.normal(kd, q.shape, dtype)

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=causal, window_size=window)
        return jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32))

    def loss_ref(q, k, v):
        o, _ = reference_attention(q, k, v, causal=causal, window=window)
        return jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32))

    o, lse = fwd(q, k, v, is_causal=causal, window_size=window)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal,
                                         window=window)
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


def main():
    ok = True
    ok &= check("w=(128,0) causal 1024", 1024, 1024, (128, 0), False)
    ok &= check("w=(256,-1)+causal 2048", 2048, 2048, (256, -1), True)
    ok &= check("w=(64,64) bidir 1024", 1024, 1024, (64, 64), False)
    ok &= check("w=(300,0) sq!=sk 897x1024", 897, 1024, (300, 0), False)
    ok &= check("w=(1,0) extreme-narrow 512", 512, 512, (1, 0), False)
    ok &= check("w=(4096,0) wider-than-seq 1024", 1024, 1024, (4096, 0),
                False)
    ok &= check("f32 w=(128,0) 1024", 1024, 1024, (128, 0), False,
                jnp.float32)
    print("window on-chip smoke:", "ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
