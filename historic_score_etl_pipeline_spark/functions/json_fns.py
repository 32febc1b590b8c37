"""JSON boundary functions (SURVEY.md §2C: C9, C10).

The engine keeps data typed (structs/arrays) end-to-end and serializes to
JSON only at sink boundaries — the reference instead round-trips through
``json.dumps``/``json.loads`` mid-pipeline (app/team_utilities.py:89,107,124;
app/ref_utilities.py:160,170-172).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def struct_to_json(*cols: Column | str) -> Column:
    """Serialize columns as a JSON object string (sink-boundary only)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.to_json(F.struct(*parts))


def json_extract_string(col: Column | str, path: str) -> Column:
    """Extract one scalar from a JSON string column, e.g. path ``'$.k'``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)
