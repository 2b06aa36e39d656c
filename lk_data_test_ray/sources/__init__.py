from .pages import ensure_pages, generate_pages, pages_nrows_for_sf  # noqa: F401
