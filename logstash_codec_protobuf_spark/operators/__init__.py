from .parse import parse_turns, split_dead_letter, PARSED_TYPE  # noqa: F401
from .normalize import (  # noqa: F401
    symbolize_enum,
    oneof_clean,
    apply_proto3_defaults,
    strip_at_keys,
    decode_json_struct,
    add_tag,
    remove_tag,
)
from .enrich import enrich  # noqa: F401
from .route import assign_sink, route_counts, fan_out  # noqa: F401
