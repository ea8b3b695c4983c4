"""Model families built on the framework's kernels."""
from flash_attention_tpu.models import llama

__all__ = ["llama"]
