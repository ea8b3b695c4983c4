#!/usr/bin/env python
"""Quantization quality harness: Δ perplexity of int8/int4 weight-only and
int8-KV models vs the full-precision model (the BASELINE.md quantized-path
acceptance methodology: "within stated Δ perplexity at same bit-width").

Without real pretrained weights, the evaluation set is self-generated: token
sequences sampled from the fp model itself, so the fp model is near its own
entropy floor and any quantization damage shows up directly in the Δ.

Usage: python tools/eval_quant.py [--layers 4] [--dim 512] [--seqs 8]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flash_attention_tpu.models import llama


def cross_entropy(params, cfg, tokens, kv_fake_quant=None):
    """Mean next-token CE (nats) over the batch, teacher-forced."""
    logits, _, _ = llama.prefill(params, tokens[:, :-1], cfg,
                                 kv_fake_quant=kv_fake_quant)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return float(jnp.mean(nll))


def sample_sequences(params, cfg, n, length, key):
    """Ancestral sampling from the fp model (temperature 1).

    Fixed-shape buffer: position i's logits come from one full-length
    prefill (causal masking makes the not-yet-written tail irrelevant), so
    the jit compiles ONCE instead of once per length — the difference
    between minutes and hours through the axon compile tunnel."""
    toks = jnp.zeros((n, length), jnp.int32)
    toks = toks.at[:, 0].set(
        jax.random.randint(key, (n,), 0, cfg.vocab_size, jnp.int32))
    for i in range(1, length):
        logits, _, _ = llama.prefill(params, toks, cfg)
        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, logits[:, i - 1])
        toks = toks.at[:, i].set(nxt.astype(jnp.int32))
    return toks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--kv-heads", type=int, default=2)
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=64)
    args = ap.parse_args()

    cfg = llama.LlamaConfig(
        vocab_size=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, head_dim=128,
        hidden_dim=args.hidden)
    key = jax.random.PRNGKey(0)
    params = llama.init_params(key, cfg, dtype=jnp.float32)

    print("sampling eval sequences from the fp model ...", flush=True)
    toks = sample_sequences(params, cfg, args.seqs, args.seqlen,
                            jax.random.PRNGKey(1))

    ce_fp = cross_entropy(params, cfg, toks)
    print(f"fp32    : CE {ce_fp:.4f} nats  ppl {jnp.exp(ce_fp):.2f}")

    def report(tag, ce):
        print(f"{tag:8s}: CE {ce:.4f} nats  ppl {jnp.exp(ce):.2f}  "
              f"dCE {ce - ce_fp:+.4f}  dppl {jnp.exp(ce) - jnp.exp(ce_fp):+.3f}")

    for bits in (8, 4):
        qp = llama.quantize_params(params, bits=bits)
        report(f"int{bits}-W", cross_entropy(qp, cfg, toks))
    # quantized-KV quality: same per-token quantizer the paged cache uses
    report("int8-KV", cross_entropy(params, cfg, toks,
                                    kv_fake_quant=jnp.int8))
    report("fp8-KV", cross_entropy(params, cfg, toks,
                                   kv_fake_quant=jnp.float8_e4m3fn))
    # combined: int8 weights + int8 KV (the full quantized serving config)
    qp8 = llama.quantize_params(params, bits=8)
    report("int8-W+KV", cross_entropy(qp8, cfg, toks,
                                      kv_fake_quant=jnp.int8))


if __name__ == "__main__":
    main()
