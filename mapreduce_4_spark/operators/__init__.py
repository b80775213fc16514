from . import dedup, similarity  # noqa: F401
