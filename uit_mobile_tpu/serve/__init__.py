from .service import TaggingService, ServiceConfig
from .http import StreamSessions, make_framewise_fn, make_http_server, serve_http
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
    "StreamSessions",
    "make_framewise_fn",
    "make_http_server",
    "serve_http",
    "MultiStreamTagger",
    "StreamingTagger",
    "StreamingConfig",
    "Event",
    "OnlineEventDetector",
    "SoundEvent",
]
