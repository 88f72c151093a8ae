"""MATCH_RECOGNIZE-style SQL front-end for the CEP operators.

Flink exposes pattern matching twice: SQL ``MATCH_RECOGNIZE`` (strictly
consecutive rows; gaps are modelled with explicit catch-all variables)
and the CEP library's ``followedBy`` (relaxed contiguity). This module
gives both a declarative clause surface over ``operators.cep``:

    out = match_recognize(events, '''
        PARTITION BY user_id
        ORDER BY ts_ms, event_id
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B C)
        WITHIN 3600000
        DEFINE
          A AS event_type = 'view',
          B AS event_type = 'click',
          C AS event_type = 'purchase'
    ''')

Mapping (each honest about what the underlying operator computes):

- ``PATTERN (A B C)`` — consecutive steps, i.e. MATCH_RECOGNIZE
  contiguity. Runs :func:`..cep.match_strict` (pure window codegen).
  Supports ``AFTER MATCH SKIP TO NEXT ROW`` only (all, possibly
  overlapping, matches) — the standard default for transparency.
- ``PATTERN (A -> B -> C)`` — Flink-CEP ``followedBy`` arrows, relaxed
  contiguity. Runs :func:`..cep.match_pattern` (greedy earliest match)
  with ``AFTER MATCH SKIP PAST LAST ROW`` only (matches never overlap
  — that is what the operator guarantees).

Restrictions (raise, never silently change semantics): DEFINE
predicates see only the current row (no ``B.price > A.price``
cross-variable references, no aggregates); no quantifiers (``B+``,
``B*``) — model gaps with arrows; MEASURES is fixed to the operator's
output (per-step order/id columns).

Output columns: the partition column, per step ``{name}_{order_col}``
and ``{name}_{tiebreak}``, plus ``match_seq`` in relaxed mode —
identical to calling the operators directly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.cep import match_pattern, match_strict

# identifier.identifier — a pattern-variable field reference (decimal
# literals like 1.5 must NOT match)
_FORBIDDEN_IN_DEFINE = re.compile(r"\b([A-Za-z_]\w*)\s*\.\s*[A-Za-z_]")


def _section(clause: str, pattern: str, required: bool = False) -> re.Match | None:
    m = re.search(pattern, clause, re.IGNORECASE | re.DOTALL)
    if required and m is None:
        raise ValueError(f"MATCH_RECOGNIZE clause missing required section: {pattern}")
    return m


def _split_top_level_commas(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def match_recognize(df: DataFrame, clause: str) -> DataFrame:
    """Parse a MATCH_RECOGNIZE-style clause (module docstring) and run
    the matching CEP operator."""
    key = _section(clause, r"PARTITION\s+BY\s+(\w+)", required=True).group(1)
    om = _section(clause, r"ORDER\s+BY\s+(\w+)\s*(?:,\s*(\w+))?", required=True)
    order_col, id_col = om.group(1), om.group(2)

    pm = _section(clause, r"PATTERN\s*\(([^)]*)\)", required=True)
    body = pm.group(1).strip()
    relaxed = "->" in body
    names = [n.strip() for n in (body.split("->") if relaxed else body.split())]
    for n in names:
        if not re.fullmatch(r"\w+", n):
            raise ValueError(
                f"unsupported pattern element {n!r}: quantifiers/alternation are "
                "not supported — model gaps with '->' (relaxed contiguity)"
            )

    wm = _section(clause, r"WITHIN\s+(\d+)")
    within = int(wm.group(1)) if wm else None

    sm = _section(clause, r"AFTER\s+MATCH\s+SKIP\s+(TO\s+NEXT\s+ROW|PAST\s+LAST\s+ROW)")
    if sm:
        skip = re.sub(r"\s+", " ", sm.group(1).upper())
        if relaxed and skip != "PAST LAST ROW":
            raise ValueError(
                "relaxed patterns (->) emit non-overlapping matches: only "
                "AFTER MATCH SKIP PAST LAST ROW is supported"
            )
        if not relaxed and skip != "TO NEXT ROW":
            raise ValueError(
                "consecutive patterns emit all (overlapping) matches: only "
                "AFTER MATCH SKIP TO NEXT ROW is supported"
            )

    defines: dict[str, str] = {}
    dm = _section(clause, r"DEFINE\s+(.*)\Z")
    if dm:
        for entry in _split_top_level_commas(dm.group(1)):
            em = re.match(r"(\w+)\s+AS\s+(.+)\Z", entry, re.IGNORECASE | re.DOTALL)
            if not em:
                raise ValueError(f"cannot parse DEFINE entry: {entry!r}")
            name, expr = em.group(1), em.group(2).strip()
            ref = _FORBIDDEN_IN_DEFINE.search(expr)
            if ref:
                raise ValueError(
                    f"DEFINE {name}: cross-variable reference {ref.group(0)!r} "
                    "is not supported — predicates see only the current row"
                )
            if name not in names:
                raise ValueError(f"DEFINE references unknown pattern variable {name!r}")
            defines[name] = expr

    steps = [(n, defines.get(n, "true")) for n in names]
    if relaxed:
        return match_pattern(
            df, steps, key_col=key, order_col=order_col, id_col=id_col, within=within
        )
    return match_strict(
        df, steps, key_col=key, order_col=order_col, id_col=id_col, within=within
    )
