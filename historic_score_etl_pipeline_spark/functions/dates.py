"""Date/time scalar functions (SURVEY.md §2C: C6, C7).

The reference parses scrape-formatted dates with a synthesized year
(``pd.to_datetime(df['date'] + '.2023', format='%d.%m. %H:%M.%Y')``,
app/team_utilities.py:433) and builds a two-day incremental horizon
(``today + timedelta(days=1)``, app/main.py:15-16).  Both are re-expressed
as native Column expressions; all date predicates are parameterized
(SURVEY.md §7 hard-part e) so plans stay deterministic and partition-
prunable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_day_month_with_year(col: Column | str, year: int = 2023) -> Column:
    """Parse ``'13.08. 20:30'`` + synthesized year → TIMESTAMP_NTZ.

    NTZ keeps parity with wall-clock semantics regardless of session
    timezone (the reference never handles timezones).  ``try_to_timestamp``
    tolerates garbage like the reference's try/except parsing.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(
        F.concat(c, F.lit(f".{year}")), F.lit("dd.MM. HH:mm.yyyy")
    ).cast("timestamp_ntz")


def parse_slash_date(col: Column | str) -> Column:
    """Parse ``'dd/MM/yyyy'`` → DATE (app/ref_utilities.py:104)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit("dd/MM/yyyy")).cast("date")


def tomorrow_of(col: Column | str) -> Column:
    """``date + 1 day`` (app/main.py:15-16).  C7."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(c.cast("date"), 1)
