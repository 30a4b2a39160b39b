from .config import (DEFAULT_ARGS, parse_config_or_kwargs, parse_override,
                     validate_frontend_precision)
from .logging import get_logger, add_file_sink
from .compile_cache import enable_compilation_cache

__all__ = [
    "DEFAULT_ARGS",
    "parse_config_or_kwargs",
    "parse_override",
    "validate_frontend_precision",
    "get_logger",
    "add_file_sink",
    "enable_compilation_cache",
]
