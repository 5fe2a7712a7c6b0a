"""Luhn (mod-10) checksum validation over candidate account numbers.

Engine-added capability: PII-candidate VALIDATION — the step after
``pii_counts``/``pii_redact``'s pattern extraction that separates real
card-shaped numbers from random digit runs. The Luhn check (Luhn 1960,
ISO/IEC 7812-1) rejects ~90% of random candidates, so running it on-cluster
collapses the false-positive review set before anything leaves the pipeline.

Implementation is pure JVM higher-order functions (the §2.9 no-Python rule):
``transform(sequence(1, length(s)), i -> digit)`` explodes nothing — the
per-row array lives inside codegen — and ``aggregate`` folds the doubled-
digit sum in one pass. Position parity is counted FROM THE RIGHT (the
standard: double every second digit starting with the check digit's left
neighbor); doubled digits > 9 subtract 9 (the digit-sum identity).

DuckDB replays with ``list_transform(range(...))`` + ``list_sum`` — exact
integer arithmetic on both engines, no floats anywhere. The kernels are
SQL-text generators over a column/expression NAME (the lambda bodies live in
SQL on both sides), so the two generators are structurally parallel and
cannot drift apart silently; tests pin published valid numbers.

Scale shape: row-local column arithmetic — no shuffle at all beyond whatever
the consumer aggregates; numbers up to ~40 digits stay far inside int64
(sum <= 9 * len * 2).

Reference analog: none — part of the engine's curation/PII widening.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sum_body(expr: str, substr: str) -> str:
    """Shared lambda body: identical text modulo the substring builtin
    name (Spark ``substring`` / DuckDB ``substr``)."""
    d = f"CAST({substr}({expr}, i, 1) AS INT)"
    return (
        f"CASE WHEN (length({expr}) - i) % 2 = 1 THEN "
        f"CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END "
        f"ELSE {d} END"
    )


def luhn_sum(expr: str) -> Column:
    """The Luhn weighted digit sum of digit-string column/expr ``expr``
    (int64); pure codegen (transform over sequence + aggregate fold)."""
    return F.expr(
        f"aggregate(transform(sequence(1, length({expr})), "
        f"i -> {_sum_body(expr, 'substring')}), 0L, (a, x) -> a + x)"
    )


def luhn_valid(expr: str) -> Column:
    """1 when the Luhn sum is divisible by 10, else 0 (int)."""
    return (luhn_sum(expr) % 10 == 0).cast("int")


def luhn_sum_sql(expr: str) -> str:
    """DuckDB replay of ``luhn_sum`` (list_transform + list_sum)."""
    return (
        f"list_sum(list_transform(range(1, length({expr}) + 1), "
        f"i -> {_sum_body(expr, 'substr')}))"
    )
