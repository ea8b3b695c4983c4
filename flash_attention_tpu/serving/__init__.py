"""Serving: paged KV cache runtime, continuous batching, engine."""
from flash_attention_tpu.serving.engine import Engine
from flash_attention_tpu.serving.native import PagedRuntime
from flash_attention_tpu.serving.scheduler import Request, Scheduler

__all__ = ["Engine", "PagedRuntime", "Request", "Scheduler"]
