from .text import (
    ASCII_PUNCT_CLASS,
    CLEAN_CLASS,
    clean_text,
    tokens,
    words,
)

__all__ = ["ASCII_PUNCT_CLASS", "CLEAN_CLASS", "clean_text", "tokens", "words"]
