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


# RE2 (Arrow) equivalent of _SCHEME_HOST: anchored, case-insensitive, DOTALL
# on the remainder so newlines survive into `rest` exactly as re.S does.
_SCHEME_HOST_RE2 = (
    r"(?i)^(?P<scheme>https?)://(?P<host>[^/?#]*)(?P<rest>(?s:.*))$")


def normalize_urls_batch(urls) -> pa.Array:
    """Vectorized canonicalization of a url column — pure Arrow kernels, no
    Python row loop (this runs on the hot canonicalize-before-shuffle path).
    Property-tested byte-equal to the scalar ``normalize_url`` reference."""
    if not isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = pa.array(list(urls), pa.string())
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(urls)
    parts = pc.extract_regex(trimmed, _SCHEME_HOST_RE2)
    matched = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    # strip the scheme's default port only
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, r":80$", ""),
        pc.replace_substring_regex(host, r":443$", ""))
    rest = pc.replace_substring_regex(
        pc.struct_field(parts, "rest"), r"(?s)#.*$", "")
    rest = pc.if_else(pc.is_in(rest, value_set=pa.array(["", "/"])),
                      pa.scalar("/"), rest)
    canon = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    # non-url strings pass through trimmed, exactly like the scalar fn
    return pc.if_else(matched, canon, trimmed)


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
