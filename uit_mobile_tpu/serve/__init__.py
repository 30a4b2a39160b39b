from .service import TaggingService, ServiceConfig

__all__ = ["TaggingService", "ServiceConfig"]
