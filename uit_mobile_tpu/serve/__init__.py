from .service import TaggingService, ServiceConfig
from .streaming import MultiStreamTagger, StreamingTagger, StreamingConfig, Event

__all__ = [
    "TaggingService",
    "ServiceConfig",
    "MultiStreamTagger",
    "StreamingTagger",
    "StreamingConfig",
    "Event",
]
