from .pallas_mel import pallas_log_mel, make_frontend_fn
from .pipeline import make_block_builder, make_forward_fn, make_scanned_forward

__all__ = ["pallas_log_mel", "make_frontend_fn", "make_forward_fn",
           "make_scanned_forward", "make_block_builder"]
