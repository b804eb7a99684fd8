from colormipsearch_tpu.utils.metrics import Metrics, stage_timer

__all__ = ["Metrics", "stage_timer"]
