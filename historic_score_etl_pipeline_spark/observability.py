"""In-flight metrics via Spark's Observation API — the engine-native
form of the reference's error side-channel.

The reference accumulates ``{context: error}`` dicts in module globals
while the pipeline runs and mails them at the end
(``app/team_utilities.py:15,459-465``; ``app/main.py:24-47``).  The sink
layer already replaces *failure recording* with an error DataFrame
(``sinks/writer.py``); this module replaces the *counting* half:
``df.observe`` attaches named aggregates to a plan so quality counters
(rows seen, nulls, rule violations) are computed DURING the one
production pass over the data — no second scan, no driver-side loop,
and at 100 TB no extra job.  Metrics surface on the driver after the
action through the Observation handle (executor→driver via
accumulators under the hood).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame, checks: dict[str, Column], name: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach ``n_rows`` plus one violation counter per named check to
    ``df``'s plan.  Each check is a boolean Column that is TRUE for a
    *bad* row.  Returns (observed_df, observation); run any action on
    the returned DataFrame, then read ``observation.get``.
    """
    obs = Observation(name) if name else Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for key, bad in checks.items():
        metrics.append(
            F.sum(F.when(bad, F.lit(1)).otherwise(F.lit(0))).alias(key)
        )
    return df.observe(obs, *metrics), obs


def event_quality_checks() -> dict[str, Column]:
    """The standard dirty-input checks for the events table — the
    engine twin of the reference's tolerated-garbage cases
    (``app/team_utilities.py:82-88``: unparseable tokens;
    ``app/ref_utilities.py:99``: empty keys)."""
    return {
        "null_user": F.col("user_id").isNull(),
        "negative_value": F.col("value") < 0,
        "bad_props": F.col("props").isNull()
        | (F.get_json_object("props", "$.k").isNull()),
    }
