from flash_attention_tpu.parallel.mesh import make_mesh
from flash_attention_tpu.parallel.sharded_attention import (
    merge_partials,
    ring_flash_attention,
    shard_flash_attention,
)
from flash_attention_tpu.parallel.tp_inference import tp_decode_step, tp_prefill

__all__ = [
    "make_mesh",
    "merge_partials",
    "ring_flash_attention",
    "shard_flash_attention",
    "tp_decode_step",
    "tp_prefill",
]
