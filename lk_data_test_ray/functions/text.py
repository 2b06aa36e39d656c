"""Vectorized text-analysis kernels for the documents/pages tables.

All functions operate on whole Arrow arrays (pyarrow.compute / numpy) — no
Python loop over rows in any hot path. Reference analog for the overall shape
is the per-record string normalization/measure code
(``scripts/make_texts.py:293,377,392``; ``utils/utilities.py:36,89``), done
here batch-at-a-time.

Semantics notes (the DuckDB oracle mirrors these exactly):
  * tokenization = regex split on ``\\s+`` (≙ DuckDB
    ``regexp_split_to_array(text, '\\s+')``)
  * ratios are plain double divisions, rounded only at the query edge
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT = r"\s+"

# tiny fixed stopword list (deterministic; mirrored verbatim in the oracle SQL)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# per-language stopword profiles for the n-gram/stopword language-ID heuristic
# (public-knowledge closed-class words; deterministic, no model download)
LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the of and to in is you that it he was for on are as with his they at".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans par sur pas".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al".split()),
    "it": frozenset("di e il la che a in un per è non una sono con si da come le".split()),
    "pt": frozenset("de a o que e do da em um para é com não uma os no se na por".split()),
    "nl": frozenset("de het een van en in is dat op te zijn met voor niet aan er ook als".split()),
    "ru": frozenset("и в не на я что он с как это по но они мы из у за то".split()),
}


def tokens_list(texts) -> pa.Array:
    """text column → list<string> token arrays (null-safe)."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    return pc.split_pattern_regex(arr, TOKEN_SPLIT)


def token_counts(texts) -> pa.Array:
    return pc.list_value_length(tokens_list(texts))


# GPT-2-style pre-tokenizer alternation, restricted to RE2 (no lookahead, so
# trailing whitespace runs count as one token each): contraction suffixes,
# space-prefixed letter/digit runs, space-prefixed punctuation runs,
# whitespace runs. The per-document BPE-ish token count is the budget unit a
# training pipeline packs/filters on (see td_pack / td_split).
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_token_counts(texts) -> pa.Array:
    """Per-document BPE-style pre-token counts — one vectorized RE2 pass
    (``pc.count_substring_regex``), no tokenizer loop, null-safe."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    return pc.count_substring_regex(arr, BPE_SPLIT_PATTERN)


def _segment_sums(flat_vals: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Sum ``flat_vals`` per list segment given per-list lengths (reduceat)."""
    out = np.zeros(len(lengths), dtype=np.float64)
    nz = lengths > 0
    if not nz.any():
        return out
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    sums = np.add.reduceat(flat_vals, offsets[nz].astype(np.int64))
    # reduceat with duplicate offsets (len-0 segments) already excluded via nz
    out[nz] = sums
    return out


def stopword_ratio(texts, stopwords=STOPWORDS) -> np.ndarray:
    """Fraction of tokens in the stopword set (0.0 for empty docs)."""
    toks = tokens_list(texts)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths.astype(np.float64), nan=0.0).astype(np.int64)
    flat = pc.list_flatten(toks)
    hits = pc.is_in(flat, value_set=pa.array(list(stopwords))).cast(pa.int8())
    hit_np = hits.to_numpy(zero_copy_only=False).astype(np.float64)
    sums = _segment_sums(hit_np, lengths)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(lengths > 0, sums / np.maximum(lengths, 1), 0.0)
    return out


def char_class_counts(texts, pattern: str) -> pa.Array:
    """Per-row count of regex matches (e.g. punctuation, digits)."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    return pc.count_substring_regex(arr, pattern)


def quality_features(texts) -> dict[str, np.ndarray]:
    """Quality-scoring feature set per document (all vectorized)."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = token_counts(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    digits = char_class_counts(arr, r"[0-9]").to_numpy(zero_copy_only=False)
    punct = char_class_counts(
        arr, r"[!-/:-@\[-`{-~]").to_numpy(zero_copy_only=False)
    denom = np.maximum(n_chars, 1.0)
    toks = tokens_list(arr)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths.astype(np.float64), nan=0.0).astype(np.int64)
    tok_lens = pc.utf8_length(pc.list_flatten(toks)).to_numpy(
        zero_copy_only=False).astype(np.float64)
    tok_len_sums = _segment_sums(tok_lens, lengths)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "digit_ratio": digits / denom,
        "punct_ratio": punct / denom,
        "stopword_ratio": stopword_ratio(arr),
        "mean_token_len": np.where(
            n_tokens > 0, tok_len_sums / np.maximum(n_tokens, 1), 0.0),
    }


def lang_id(texts, profiles: dict[str, frozenset] = LANG_PROFILES) -> np.ndarray:
    """Stopword-profile language ID: argmax of per-language hit fractions.

    Deterministic: ties and zero-hit documents resolve to the alphabetically
    first language / ``"und"``. A heuristic stand-in for a model scorer — the
    actor-pool plumbing (vocab loaded once per actor) is the real deliverable,
    mirroring the reference's membership checks (T9,
    ``curation/check_authors_exist_in_listperson.py:4-25``).
    """
    langs = sorted(profiles)
    toks = tokens_list(texts)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths.astype(np.float64), nan=0.0).astype(np.int64)
    flat = pc.utf8_lower(pc.list_flatten(toks))
    scores = np.zeros((len(langs), len(lengths)), dtype=np.float64)
    for i, lg in enumerate(langs):
        hits = pc.is_in(flat, value_set=pa.array(sorted(profiles[lg])))
        hnp = hits.cast(pa.int8()).to_numpy(zero_copy_only=False).astype(np.float64)
        scores[i] = _segment_sums(hnp, lengths)
    best = np.argmax(scores, axis=0)  # first max wins → alphabetical tiebreak
    top = scores[best, np.arange(len(lengths))]
    out = np.array(langs, dtype=object)[best]
    out[top <= 0] = "und"
    return out


def word_ngrams_batch(texts, k: int):
    """Word k-grams for a batch of texts, built entirely on Arrow/numpy
    kernels (token explode → windowed take → list binary_join): returns
    ``(grams, gram_counts, row_of_gram)`` where ``grams`` is a string Array
    of every k-gram in row order, ``gram_counts[i]`` is row i's gram count
    (``max(n_tokens - k + 1, 0)``; null text → 0), and ``row_of_gram`` maps
    each gram to its row index. Shared kernel of the repetition-quality and
    decontamination operators."""
    toks = pc.split_pattern_regex(
        texts.combine_chunks() if isinstance(texts, pa.ChunkedArray)
        else texts, TOKEN_SPLIT)
    nw = pc.fill_null(pc.list_value_length(toks), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    nb = len(nw)
    flat = pc.list_flatten(toks)
    offs = np.concatenate([[0], np.cumsum(nw)])
    gcnt = np.maximum(nw - k + 1, 0)
    G = int(gcnt.sum())
    if G == 0:
        return (pa.array([], pa.string()), gcnt,
                np.empty(0, dtype=np.int64))
    goffs0 = np.concatenate([[0], np.cumsum(gcnt)])
    grow = np.repeat(np.arange(nb), gcnt)
    gstart = np.arange(G) - np.repeat(goffs0[:-1], gcnt)
    base = offs[grow] + gstart
    tk = (base[:, None] + np.arange(k)).ravel()
    gwords = flat.take(pa.array(tk, pa.int64()))
    grams = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(np.arange(0, (G + 1) * k, k, dtype=np.int32)), gwords),
        " ")
    return grams, gcnt, grow
