from .service import TaggingService, ServiceConfig
from .streaming import (
    Event,
    MultiStreamTagger,
    OnlineEventDetector,
    SoundEvent,
    StreamingConfig,
    StreamingTagger,
)

__all__ = [
    "TaggingService",
    "ServiceConfig",
    "MultiStreamTagger",
    "StreamingTagger",
    "StreamingConfig",
    "Event",
    "OnlineEventDetector",
    "SoundEvent",
]
