from .mixup import mixup_tensor, mixup_targets, mixup_lengths, sample_mixup_lambdas
from .wav import parse_wavtransforms
from .spec import parse_spectransforms

__all__ = [
    "mixup_tensor",
    "mixup_targets",
    "mixup_lengths",
    "sample_mixup_lambdas",
    "parse_wavtransforms",
    "parse_spectransforms",
]
