"""Python UDTFs (SURVEY.md §2J-J2): table-generating functions, SQL-visible.

The reference's ``matches_scores`` turns one fixture URL into three nested
documents (app/team_utilities.py:17-127) — a 1-row-in/N-rows-out shape.
The engine exposes that shape two ways: ``mapInPandas`` for the Arrow
bulk path (contract key ``udtf_explode_matches``) and, here, a real
Python UDTF registered in the SQL catalog so ``LATERAL`` queries can call
it: the form a SQL-first user of the engine reaches for.

UDTF evaluation is row-at-a-time Python — fine for moderate fan-out,
but bulk hot paths should prefer the Arrow-batched mapInPandas twin.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="rec: int, chunk: string")
class SplitChunks:
    """text → (rec, chunk) rows of at most ``size`` characters; the
    1-in/N-out explode of the reference's per-URL document expansion."""

    def eval(self, text: str, size: int):  # noqa: D102
        if not text or size <= 0:
            return
        for i, start in enumerate(range(0, len(text), size)):
            yield i, text[start : start + size]


@udtf(returnType="pos: int, field: int, tok: string")
class TokenizeRecords:
    """Tokenizer twin of the round-robin parser (app/team_utilities.py:
    76-88): emits (position, field = pos mod 6, token) for LATERAL use."""

    def eval(self, raw: str):  # noqa: D102
        if raw is None:
            return
        toks = [t for t in raw.replace("\n", ",").split(",") if t.strip()]
        for pos, tok in enumerate(toks):
            yield pos, pos % 6, tok.strip()


def register_udtfs(spark: SparkSession) -> None:
    """Install the UDTFs in the session's SQL catalog."""
    spark.udtf.register("split_chunks", SplitChunks)
    spark.udtf.register("tokenize_records", TokenizeRecords)
