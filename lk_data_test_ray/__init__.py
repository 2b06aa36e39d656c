"""lk_data_test_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch re-expression of the query / data-processing capabilities of
the reference repo ``semantic-kraus/lk-data-test`` (see ``SURVEY.md``) as an
idiomatic Ray Data engine over Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``.

Layout:
    functions/     pure deterministic row/batch kernels (extract, hashing, text)
    sketches/      mergeable streaming sketches (HyperLogLog, Bloom, t-digest)
    sources/       synthetic pages generator + parquet readers
    relational.py  generic operators (broadcast joins, partial agg, top-k, argmax)
    checks/        constraint suite (C0..C6) + data-driven Rule protocol
    pipelines/     end-to-end pipelines (validation job, queries, dedup, ANN,
                   multimodal stages)
    state/         lineage manifests / checkpoint-resume store
    __main__.py    CLI (`python -m lk_data_test_ray validate ...`)

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (bench.py, CLI, pytest fixture, or the external driver).
"""

from . import _env  # noqa: F401  (thread-safe fsspec/http import shim)

__version__ = "0.1.0"
