"""flash_attention_tpu — a TPU-native flash-attention framework.

A from-scratch JAX/Pallas re-design of the capabilities of
``ssiu/flash-attention-turing`` (see SURVEY.md): a tiled QK^T -> online-softmax
-> PV forward kernel, a recompute-based three-part backward, lower-right-aligned
causal masking, GQA/MQA, and variable-length batches — plus the TPU-serving
extensions (quantized KV-cache, paged attention, mesh sharding) the reference
lacks.

Public API surface (parity with the reference's pybind exports,
``/root/reference/csrc/flash_attn/flash_api.cpp:471-476``):

    fwd(q, k, v, is_causal)                  -> (o, lse)
    bwd(q, k, v, o, lse, do, is_causal)      -> (dq, dk, dv)
    varlen_fwd(q, k, v, cu_q, cu_k, ...)     -> (o, lse)
    varlen_bwd(q, k, v, o, lse, do, ...)     -> (dq, dk, dv)

plus the idiomatic differentiable entry point:

    flash_attention(q, k, v, causal=False, segment_ids=None, sm_scale=None)
"""

from flash_attention_tpu.ops.attention import (
    SegmentIds,
    flash_attention,
    fwd,
    bwd,
    varlen_fwd,
    varlen_bwd,
)
from flash_attention_tpu.ops.configs import BlockSizes
from flash_attention_tpu.ops.paged_attention import paged_attention
from flash_attention_tpu.ops.quant import (
    QuantizedTensor,
    quantize_int4,
    quantize_int8,
    quantize_kv_pages,
    quantized_matmul,
)

__version__ = "0.1.0"

__all__ = [
    "SegmentIds",
    "flash_attention",
    "fwd",
    "bwd",
    "varlen_fwd",
    "varlen_bwd",
    "BlockSizes",
    "paged_attention",
    "QuantizedTensor",
    "quantize_int4",
    "quantize_int8",
    "quantize_kv_pages",
    "quantized_matmul",
]
