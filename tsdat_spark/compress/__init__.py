"""Cold-tier compression codecs (Gorilla XOR + delta-of-delta)."""

from .gorilla import gorilla_decode, gorilla_encode  # noqa: F401
