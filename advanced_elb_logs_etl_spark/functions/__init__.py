from .scalars import (  # noqa: F401
    is_bot,
    path_depth,
    path_main_segment,
    status_code_type,
    time_to_eastern,
    to_float_col,
    to_int_col,
)
