"""Key canonicalization (M4) + geo formatting (M7) scalar kernels.

Reference analogs: ``slugify(url)`` / ``.lower().strip()`` before every dict
probe (``scripts/make_texts.py:253-254,268-269,469,505``;
``curation/check_fackel_references.py:27,47``) and the ``"lon lat"`` text →
WKT point literal (``utils/utilities.py:507-514``). Canonicalization runs as
a vectorized batch stage BEFORE any shuffle or join so equal keys collide
regardless of surface form.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCHEME_HOST = re.compile(r"^(https?)://([^/?#]*)(.*)$", re.S | re.I)
_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def normalize_url(url: str | None) -> str | None:
    """Canonical url: lowercase scheme+host, strip default port, fragment,
    trailing slash on bare hosts. Pure and deterministic (never locale-aware).
    """
    if url is None:
        return None
    m = _SCHEME_HOST.match(url.strip())
    if not m:
        return url.strip()
    scheme, host, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
    port = _DEFAULT_PORT[scheme]
    if host.endswith(port):
        host = host[: -len(port)]
    rest = rest.split("#", 1)[0]
    if rest in ("", "/"):
        rest = "/"
    return f"{scheme}://{host}{rest}"


def normalize_urls_batch(urls) -> pa.Array:
    """Vectorized-ish canonicalization of a url column (regex per row; the
    hot path runs once before the shuffle, amortized across the pipeline)."""
    vals = urls.to_pylist() if hasattr(urls, "to_pylist") else list(urls)
    return pa.array([normalize_url(u) for u in vals], pa.string())


def point_wkt(lon_lat_text) -> pa.Array:
    """``"lon lat"`` strings → ``POINT(lon lat)`` WKT literals (M7),
    fully vectorized via Arrow string kernels."""
    arr = (lon_lat_text.combine_chunks()
           if isinstance(lon_lat_text, pa.ChunkedArray) else lon_lat_text)
    collapsed = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(arr), r"\s+", " ")
    return pc.binary_join_element_wise(
        pa.array(["POINT("] * len(arr)), collapsed,
        pa.array([")"] * len(arr)), pa.scalar(""))
