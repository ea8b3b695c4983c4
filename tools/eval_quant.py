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


def cross_entropy(params, cfg, tokens):
    """Mean next-token CE (nats) over the batch, teacher-forced."""
    logits, _, _ = llama.prefill(params, tokens[:, :-1], cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return float(jnp.mean(nll))


def sample_sequences(params, cfg, n, length, key):
    """Ancestral sampling from the fp model (temperature 1)."""
    toks = jax.random.randint(key, (n, 1), 0, cfg.vocab_size, jnp.int32)
    for i in range(length - 1):
        logits, _, _ = llama.prefill(params, toks, cfg)
        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, logits[:, -1])
        toks = jnp.concatenate([toks, nxt[:, None].astype(jnp.int32)], axis=1)
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
    print(f"fp32   : CE {ce_fp:.4f} nats  ppl {jnp.exp(ce_fp):.2f}")
    for bits in (8, 4):
        qp = llama.quantize_params(params, bits=bits)
        ce = cross_entropy(qp, cfg, toks)
        print(f"int{bits}   : CE {ce:.4f} nats  ppl {jnp.exp(ce):.2f}  "
              f"dCE {ce - ce_fp:+.4f}  dppl {jnp.exp(ce) - jnp.exp(ce_fp):+.3f}")


if __name__ == "__main__":
    main()
