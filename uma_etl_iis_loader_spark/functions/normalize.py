"""Normalization kit (SURVEY.md §2.9, X4-X6, X9).

Replicates the reference's defensive scalar patterns with Catalyst-native
expressions. The subtle one: Python ``a or b`` treats ``''`` (and ``0``) as
missing (`iis_etl/logic.py:89,113,338`), so the Spark equivalent is
``coalesce(nullif(trim(a), ''), b)``, NOT plain ``coalesce``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Russian day name ↔ int (iis_etl/logic.py:13-16, 454-457)
DAYS_MAP: dict[str, int] = {
    "Понедельник": 1,
    "Вторник": 2,
    "Среда": 3,
    "Четверг": 4,
    "Пятница": 5,
    "Суббота": 6,
    "Воскресенье": 7,
}
DAY_NAMES: dict[int, str] = {v: k for k, v in DAYS_MAP.items()}


def py_or_str(col: Column | str, *fallbacks: Column) -> Column:
    """Python ``x or y or ...`` over strings: '' and NULL both fall
    through; surviving values pass UNCHANGED (whitespace-only strings are
    truthy in Python, so no trim — caught by the property test)."""
    chain = [F.nullif(F.col(col) if isinstance(col, str) else col, F.lit(""))]
    chain.extend(F.nullif(f, F.lit("")) for f in fallbacks[:-1])
    if fallbacks:
        chain.append(fallbacks[-1])
    return F.coalesce(*chain)


def py_or_int(col: Column | str, default: int) -> Column:
    """Python ``x or default`` over ints: 0 and NULL both fall through."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.nullif(c, F.lit(0)), F.lit(default))


def norm_key(col: Column | str) -> Column:
    """lower+trim string-key normalization (iis_etl/logic.py:180,209)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def truncate(col: Column | str, n: int) -> Column:
    """``str(x)[:n]`` (iis_etl/logic.py:91,259)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c.cast("string"), 1, n)


def day_int_expr(day_name: Column) -> Column:
    """Russian day name → 1-7, NULL for unknown (iis_etl/logic.py:324-327).

    Chained ``when`` produces ONE flat CaseWhen node; a loop of
    ``.otherwise(prev)`` would nest seven CASE expressions and bloat
    codegen."""
    items = iter(DAYS_MAP.items())
    name, num = next(items)
    expr = F.when(day_name == name, F.lit(num))
    for name, num in items:
        expr = expr.when(day_name == name, F.lit(num))
    return expr.otherwise(F.lit(None).cast("int"))


def day_name_expr(day_int: Column) -> Column:
    """int 1-7 → Russian day name (CASE in iis_etl/logic.py:454-457)."""
    items = iter(DAY_NAMES.items())
    num, name = next(items)
    expr = F.when(day_int == num, F.lit(name))
    for num, name in items:
        expr = expr.when(day_int == num, F.lit(name))
    return expr.otherwise(F.lit(None).cast("string"))


def default_weeks(weeks: Column) -> Column:
    """``[]``/NULL/``[0]`` → [1,2,3,4] (X4, iis_etl/logic.py:18-21)."""
    return (
        F.when(
            weeks.isNull()
            | (F.size(weeks) == 0)
            | (weeks == F.array(F.lit(0))),
            F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)),
        )
        .otherwise(weeks)
    )


def auditory_names(auds: Column) -> Column:
    """Heterogeneous auditory entries → clean name strings (X5,
    iis_etl/logic.py:23-34): prefer ``name``, fall back to ``str(id)``
    with Python-`or` semantics (an EMPTY name also falls through,
    `a.get('name') or str(a.get('id',''))`), drop null/empty results."""
    named = F.transform(
        auds,
        lambda a: F.coalesce(F.nullif(a["name"], F.lit("")), a["id"].cast("string")),
    )
    return F.filter(named, lambda x: x.isNotNull() & (x != ""))


def fio(emps: Column) -> Column:
    """Employee entries → '"Last First"' display names, trimmed, empties
    dropped (X6, iis_etl/logic.py:36-50)."""
    names = F.transform(
        emps, lambda e: F.trim(F.concat_ws(" ", e["lastName"], e["firstName"]))
    )
    return F.filter(names, lambda x: x != "")
