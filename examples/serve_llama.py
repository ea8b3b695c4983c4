#!/usr/bin/env python
"""End-to-end serving example: HuggingFace Llama weights -> (optional)
weight-only quantization -> continuous-batching engine on the paged KV cache.

With no checkpoint argument, a small random HF Llama is instantiated so the
example runs anywhere (and its greedy output is cross-checked against
transformers).

Usage:
  python examples/serve_llama.py                       # random tiny model
  python examples/serve_llama.py --hf-path <dir>       # real checkpoint
  python examples/serve_llama.py --quantize int8 --kv-quant
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models import llama
from flash_attention_tpu.models.import_hf import from_hf
from flash_attention_tpu.serving.engine import Engine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf-path", default=None,
                    help="HF Llama checkpoint dir (default: random tiny model)")
    ap.add_argument("--quantize", choices=["none", "int8", "int4"],
                    default="none")
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8 paged KV cache (page_size 128)")
    ap.add_argument("--max-new-tokens", type=int, default=16)
    args = ap.parse_args()

    import transformers
    if args.hf_path:
        model = transformers.AutoModelForCausalLM.from_pretrained(args.hf_path)
    else:
        cfg_hf = transformers.LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, tie_word_embeddings=False)
        model = transformers.LlamaForCausalLM(cfg_hf)
    model.eval()

    params, cfg = from_hf(model, dtype=jnp.float32 if not args.hf_path
                          else jnp.bfloat16)
    if args.quantize != "none":
        params = llama.quantize_params(params, bits=int(args.quantize[3:]))

    page_size = 128 if args.kv_quant else 64
    eng = Engine(cfg, params, total_pages=128, page_size=page_size,
                 max_batch=4, max_seq_len=1024,
                 kv_dtype=jnp.float32 if not args.hf_path else jnp.bfloat16,
                 kv_quant=args.kv_quant)

    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(0, cfg.vocab_size - 1, size=n)))
               for n in (7, 19, 33)]
    reqs = [eng.add_request(p, max_new_tokens=args.max_new_tokens)
            for p in prompts]
    eng.run()
    for r, p in zip(reqs, prompts):
        print(f"prompt[{len(p)} toks] -> {r.output}")
    print({k: round(v, 1) for k, v in eng.throughput().items()})

    if not args.hf_path and args.quantize == "none" and not args.kv_quant:
        import torch
        ok = True
        for r, p in zip(reqs, prompts):
            hf = model.generate(torch.tensor([p]), do_sample=False,
                                max_new_tokens=args.max_new_tokens,
                                pad_token_id=0)[0, len(p):].tolist()
            ok &= (r.output == hf)
        print("matches transformers greedy:", ok)


if __name__ == "__main__":
    main()
