from flash_attention_tpu.utils.metrics import error_metrics, assert_metrics

__all__ = ["error_metrics", "assert_metrics"]
