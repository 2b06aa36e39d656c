"""Data-driven rule checks — the engine's user-extension surface.

Reference analog: the rule table ``curation/work_type_mapping.py:1-23`` (five
(type_value, xpath) rules applied by ``curation/add_work_types.py:12-21``) and
the parameterized graph builders of ``scripts/utils/utilities.py:219-343`` —
behavior configured as DATA, not code. Here a constraint is a ``Rule`` row
(column, op, parameters); a rule list compiles to ONE fused vectorized
``map_batches`` pass emitting violation rows, so adding a rule never adds a
pass over the data.

Supported ops (all pyarrow-vectorized):
    not_null        column must be non-null (and non-empty for strings)
    in_set          value ∈ ``values``
    range           ``lo`` ≤ value < ``hi`` (either bound optional)
    regex_match     full-match of ``pattern``
    consistent_len  column == utf8_length(of_column)  (cross-column check)
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


@dataclass(frozen=True)
class Rule:
    check_id: str
    column: str
    op: str  # not_null | in_set | range | regex_match | consistent_len
    values: tuple = ()
    lo: object = None
    hi: object = None
    pattern: str = ""
    of_column: str = ""
    severity: str = "error"
    detail: str = ""

    def required_columns(self) -> list[str]:
        cols = [self.column]
        if self.of_column:
            cols.append(self.of_column)
        return cols


def _violation_mask(rule: Rule, batch: pa.Table) -> pa.Array:
    col = batch[rule.column]
    if rule.op == "not_null":
        bad = pc.is_null(col)
        if pa.types.is_string(col.type):
            bad = pc.or_kleene(
                bad, pc.equal(pc.coalesce(pc.utf8_length(col), pa.scalar(0)), 0))
        return bad
    if rule.op == "in_set":
        ok = pc.is_in(col, value_set=pa.array(list(rule.values)))
        return pc.coalesce(pc.invert(ok), pa.scalar(True))
    if rule.op == "range":
        bad = pa.array([False] * batch.num_rows)
        if rule.lo is not None:
            bad = pc.or_kleene(bad, pc.less(col, pa.scalar(rule.lo)))
        if rule.hi is not None:
            bad = pc.or_kleene(bad, pc.greater_equal(col, pa.scalar(rule.hi)))
        return pc.coalesce(bad, pa.scalar(True))  # null → violation
    if rule.op == "regex_match":
        ok = pc.match_substring_regex(col, f"^(?:{rule.pattern})$")
        return pc.coalesce(pc.invert(ok), pa.scalar(True))
    if rule.op == "consistent_len":
        length = pc.coalesce(
            pc.utf8_length(batch[rule.of_column]).cast(col.type),
            pa.scalar(-1).cast(col.type))
        return pc.not_equal(col, length)
    raise ValueError(f"unknown rule op: {rule.op!r}")


def run_rule_checks(ds: rd.Dataset, rules: list[Rule],
                    id_col: str) -> rd.Dataset:
    """Apply all rules in one fused pass → (check_id, {id_col}, detail) rows."""
    needed = sorted({id_col} | {c for r in rules for c in r.required_columns()})

    def check(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        out_c, out_i, out_d = [], [], []
        for rule in rules:
            mask = _violation_mask(rule, batch)
            flagged = ids.filter(mask).to_pylist()
            out_c.extend([rule.check_id] * len(flagged))
            out_i.extend(flagged)
            out_d.extend([rule.detail or rule.op] * len(flagged))
        return pa.table({
            "check_id": pa.array(out_c, pa.string()),
            id_col: pa.array(out_i, ids.type),
            "detail": pa.array(out_d, pa.string()),
        })

    return ds.select_columns(needed).map_batches(check, batch_format="pyarrow")
