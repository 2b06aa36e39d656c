"""Environment shims (imported once from the package __init__).

``ray.data.read_parquet`` probes ``fsspec.implementations.http`` on every
path resolution. In this environment aiohttp is absent, so that import always
fails — normally caught (ModuleNotFoundError), but when two threads resolve
paths concurrently (e.g. the row phase and the C1 uniqueness pass running
side by side) the loser of the import race sees a partially-initialized
module and gets a plain ImportError, which Ray does NOT catch. Registering a
stub module makes the probe deterministic and thread-safe; the sentinel class
is never instantiated (we only read local files).
"""

from __future__ import annotations

import sys
import types


def _shim_fsspec_http() -> None:
    try:
        import aiohttp  # noqa: F401

        return  # real HTTPFileSystem is importable; nothing to do
    except ImportError:
        pass
    if "fsspec.implementations.http" in sys.modules:
        return
    try:
        import fsspec.implementations  # noqa: F401
    except ImportError:
        return

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel only — isinstance() checks return False
        protocol = ("http", "https")

        def __init__(self, *a, **k):
            raise ImportError("aiohttp is not available in this environment")

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    sys.modules["fsspec.implementations"].http = mod


_shim_fsspec_http()
