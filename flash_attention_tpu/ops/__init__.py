from flash_attention_tpu.ops.attention import (
    flash_attention,
    fwd,
    bwd,
    varlen_fwd,
    varlen_bwd,
)
from flash_attention_tpu.ops.configs import BlockSizes
from flash_attention_tpu.ops.reference import reference_attention

__all__ = [
    "flash_attention",
    "fwd",
    "bwd",
    "varlen_fwd",
    "varlen_bwd",
    "BlockSizes",
    "reference_attention",
]
