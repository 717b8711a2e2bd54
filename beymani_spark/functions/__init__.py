from .seasonal import cycle_index, CYCLE_TYPES
from .scaling import exp_scale, logistic_scale
from .scores import aggregate_scores, tag_label

__all__ = [
    "cycle_index",
    "CYCLE_TYPES",
    "exp_scale",
    "logistic_scale",
    "aggregate_scores",
    "tag_label",
]
