from .pallas_mel import pallas_log_mel, make_frontend_fn

__all__ = ["pallas_log_mel", "make_frontend_fn"]
