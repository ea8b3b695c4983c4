from flash_attention_tpu.parallel.mesh import make_mesh
from flash_attention_tpu.parallel.sharded_attention import (
    merge_partials,
    ring_flash_attention,
    shard_flash_attention,
)

__all__ = [
    "make_mesh",
    "merge_partials",
    "ring_flash_attention",
    "shard_flash_attention",
]
