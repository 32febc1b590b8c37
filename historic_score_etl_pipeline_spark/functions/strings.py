"""String scalar functions — pure Column expressions, JVM-side, codegen'd.

Each function re-expresses one of the reference's row-at-a-time Python string
transforms (SURVEY.md §2C) as a native Spark expression, so the hot path
never leaves whole-stage codegen.  Reference citations are to files under
``/root/reference/``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_safe_csv(arr: Column, sep: str = ",") -> Column:
    """``concat_ws`` that PROPAGATES a NULL array instead of rendering it
    as ``''`` — determinism rule 7 (ARCHITECTURE.md): Spark's concat_ws
    silently merges a NULL array with the empty encoding, so every
    fingerprint/CSV-encoding of a nullable array must go through this
    (the oracle side's ``array_to_string(NULL)`` stays NULL)."""
    return F.when(arr.isNotNull(), F.concat_ws(sep, arr))


def split_clean(col: Column | str, newline_to: str = ",") -> Column:
    """Newline-normalising tokenizer.

    Reference: ``item.replace('\\n', ',').split(',')``
    (app/team_utilities.py:53-54, :415).  C1 in SURVEY.md §2C.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(c, "\n", newline_to), newline_to)


def first_token(col: Column | str, sep: str = "'") -> Column:
    """Everything before the first separator.

    Reference: ``con.split("'")[0]`` — the activity minute before the first
    quote (app/team_utilities.py:133-134).  C3.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, sep, 1)


def overtime_minute(col: Column | str) -> Column:
    """Stoppage-time arithmetic: ``'45+2'`` → 47, ``'90'`` → 90.

    Reference: split on ``+`` and add both parts
    (app/team_utilities.py:135-139).  C4.  Uses ``try_cast`` so garbage
    yields NULL instead of raising under ANSI mode — matching the
    reference's cast-or-skip tolerance (app/team_utilities.py:82-88).
    """
    c = F.col(col) if isinstance(col, str) else col
    base = F.split(c, r"\+").getItem(0).try_cast("int")
    extra = F.split(c, r"\+").getItem(1).try_cast("int")
    return F.when(c.contains("+"), base + extra).otherwise(c.try_cast("int"))


def extract_svg_class_token(col: Column | str) -> Column:
    """First ``[<>]``-delimited token containing ``svg class``.

    Reference: ``[i for i in re.split(r'[<>]', activity) if 'svg class' in
    i][0]`` (app/team_utilities.py:147-149).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, "[<>]")
    hits = F.filter(toks, lambda t: t.contains("svg class"))
    return hits.getItem(0)


def classify_activity(token: Column | str) -> Column:
    """Classify an svg-class token into the 7 match-activity types.

    Reference semantics (app/team_utilities.py:146-163): iterate the dict
    ``{'card': 'red-yellowcard', 'red': 'redcard', 'soccer': 'goal',
    'substitution': 'substitution', 'var': 'var',
    'warning': 'penalty(missed)', 'yellow': 'yellowcard'}`` in insertion
    order, first matching substring wins — EXCEPT ``'card'`` only matches
    when neither ``'red'`` nor ``'yellow'`` is present (the dual-card
    disambiguation at :155-158).  Re-expressed as an ordered CASE chain;
    WHEN order encodes the dict-iteration precedence.
    """
    c = F.col(token) if isinstance(token, str) else token
    return (
        F.when(
            c.contains("card") & ~c.contains("red") & ~c.contains("yellow"),
            F.lit("red-yellowcard"),
        )
        .when(c.contains("red"), F.lit("redcard"))
        .when(c.contains("soccer"), F.lit("goal"))
        .when(c.contains("substitution"), F.lit("substitution"))
        .when(c.contains("var"), F.lit("var"))
        .when(c.contains("warning"), F.lit("penalty(missed)"))
        .when(c.contains("yellow"), F.lit("yellowcard"))
        .otherwise(F.lit(None).cast("string"))
    )


# The same precedence chain as ANSI SQL — used by oracle twins and the
# pandas_udf parity test so Spark and DuckDB share one source of truth.
CLASSIFY_ACTIVITY_SQL_CASE = """
CASE
  WHEN {c} LIKE '%card%' AND {c} NOT LIKE '%red%' AND {c} NOT LIKE '%yellow%'
    THEN 'red-yellowcard'
  WHEN {c} LIKE '%red%' THEN 'redcard'
  WHEN {c} LIKE '%soccer%' THEN 'goal'
  WHEN {c} LIKE '%substitution%' THEN 'substitution'
  WHEN {c} LIKE '%var%' THEN 'var'
  WHEN {c} LIKE '%warning%' THEN 'penalty(missed)'
  WHEN {c} LIKE '%yellow%' THEN 'yellowcard'
  ELSE NULL
END
"""


def classify_activity_py(token: str) -> str | None:
    """Plain-Python twin of :func:`classify_activity` (used by the
    pandas_udf operator J1 and property tests)."""
    if token is None:
        return None
    if "card" in token and "red" not in token and "yellow" not in token:
        return "red-yellowcard"
    for key, label in (
        ("red", "redcard"),
        ("soccer", "goal"),
        ("substitution", "substitution"),
        ("var", "var"),
        ("warning", "penalty(missed)"),
        ("yellow", "yellowcard"),
    ):
        if key in token:
            return label
    return None
