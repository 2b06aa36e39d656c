"""C5 lang-distribution drift: chi-square goodness-of-fit vs a reference
histogram.

Reference analog: duplicate-count histograms written for human review
(``curation/check_fackel_references.py:32-37,55-60``) — the engine replaces the
human with a chi-square test against a broadcast expected distribution.

Observed counts come from the row phase's per-batch partial lang counts
(merged associatively on the driver) — pre-aggregation means this global check
needs **no shuffle at all**; the generic salted-groupby operator
(``stages/agg.py``) is the fallback when counts can't ride along with the row
phase.

The p-value uses the Wilson–Hilferty (1931) chi-square → normal approximation
(no scipy in the environment); accurate to ~1e-3 for df ≥ 3, far more than a
pass/fail gate needs.
"""

from __future__ import annotations

import math


def chi_square_pvalue(chi2: float, df: int) -> float:
    """Wilson–Hilferty approximation of the chi-square upper tail."""
    if df <= 0:
        return 1.0
    if chi2 <= 0:
        return 1.0
    z = ((chi2 / df) ** (1.0 / 3.0) - (1 - 2.0 / (9 * df))) / math.sqrt(2.0 / (9 * df))
    return 0.5 * math.erfc(z / math.sqrt(2))


def chi_square_drift(
    observed: dict[str, int],
    expected_fractions: dict[str, float],
    alpha: float = 1e-3,
) -> dict:
    """Compare observed category counts to an expected distribution.

    Only categories present in the reference histogram participate (invalid
    codes are C3's job, not drift's); expected fractions are renormalized over
    those categories.
    """
    cats = sorted(expected_fractions)
    obs = {c: observed.get(c, 0) for c in cats}
    total = sum(obs.values())
    norm = sum(expected_fractions[c] for c in cats)
    if total == 0 or norm == 0:
        return {"chi2": 0.0, "df": 0, "p_value": 1.0, "passed": True,
                "total": 0, "per_lang": {}}
    chi2 = 0.0
    per_lang = {}
    for c in cats:
        e = total * expected_fractions[c] / norm
        if e <= 0:
            continue
        contrib = (obs[c] - e) ** 2 / e
        chi2 += contrib
        per_lang[c] = {"observed": obs[c], "expected": round(e, 2),
                       "chi2_contrib": round(contrib, 4)}
    df = len(cats) - 1
    p = chi_square_pvalue(chi2, df)
    return {"chi2": round(chi2, 4), "df": df, "p_value": p,
            "passed": p >= alpha, "total": total, "per_lang": per_lang}
