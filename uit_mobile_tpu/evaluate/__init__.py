from .metrics import ALL_EVAL_METRICS, compute_metrics, gsc_accuracy
from .harness import Evaluator

__all__ = ["ALL_EVAL_METRICS", "compute_metrics", "gsc_accuracy", "Evaluator"]
