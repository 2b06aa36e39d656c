from .extract import extract_text, extract_links  # noqa: F401
from .hashing import stable_hash64, hash_strings64  # noqa: F401
