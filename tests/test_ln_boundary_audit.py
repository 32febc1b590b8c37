"""Boundary audit for the micro-nat ln fixpoints (ADVICE r5).

The oracle convention fixpoints every ln-based term as
``floor(ln(x) * 1e6 + 0.5)`` computed INDEPENDENTLY in Spark and DuckDB.
Both call into libm-compatible doubles, so the only way the integer can
diverge cross-engine is a 1-ulp ln difference landing exactly on a
``frac(...) == 0.5`` rounding boundary.  This audit enumerates every ln
argument that actually arises on the fixture data (sf0.001 and sf0.01 —
the pytest and external-driver scales) and asserts the fractional part
is at least ``_MARGIN`` away from 0.5, so a boundary collision is
caught at authoring time instead of surfacing as a flaky external row.

Audited fixpoints:
* ``agg_hll_portable`` LinearCounting — ``256·ln(256/V)`` at UNIT
  precision, V ∈ 1..255 (exhaustive: V is structurally bounded, so
  this covers every possible fixture).
* ``text_zipf_slope`` — ``ln(rank)·1e6`` / ``ln(freq)·1e6``.
* ``event_survival_km`` — ``(ln(n−d) − ln(n))·1e6``.
* ``event_cooccurrence_pmi`` — ``ln(n_xy·N/(c_x·c_y))·1e6``.
"""

from __future__ import annotations

import glob
import math
import os

import duckdb
import pytest

_SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
# distance from the .5 rounding boundary that a 1-ulp libm divergence
# cannot cross: ulp(ln(x)*1e6) is ~2e-10 for values around 1e7
_MARGIN = 1e-9


def _frac_margin(x: float) -> float:
    return abs(x - math.floor(x) - 0.5)


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("events", "documents"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if glob.glob(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def test_hll_linear_counting_boundaries_exhaustive():
    # V is an integer in 1..255 whenever the LC branch fires — audit the
    # complete domain once, independent of any fixture
    for v in range(1, 256):
        x = 256.0 * math.log(256.0 / v)
        assert _frac_margin(x) > _MARGIN, (
            f"HLL LinearCounting boundary collision at V={v}: "
            f"256*ln(256/{v}) = {x!r} has frac within {_MARGIN} of 0.5"
        )


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_zipf_rank_freq_boundaries(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        """
        WITH toks AS (
          SELECT lang, t AS tok
          FROM (SELECT lang,
                       unnest(list_filter(
                         string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t <> '')) AS t
                FROM documents)
        ), freqs AS (
          SELECT lang, tok, count(*) AS freq FROM toks GROUP BY lang, tok
        ), ranked AS (
          SELECT lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY freq DESC, tok ASC) AS rank,
                 freq
          FROM freqs
        )
        SELECT DISTINCT v FROM (
          SELECT rank AS v FROM ranked WHERE rank <= 2000
          UNION ALL
          SELECT freq AS v FROM ranked WHERE rank <= 2000
        )
        """
    ).fetchall()
    assert rows
    for (v,) in rows:
        x = math.log(float(v)) * 1e6
        assert _frac_margin(x) > _MARGIN, (
            f"zipf boundary collision at {sf_dir}: ln({v})*1e6 = {x!r}"
        )


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_survival_km_term_boundaries(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        """
        WITH per AS (
          SELECT user_id,
                 min(CAST(ts AS DATE)) AS d0,
                 min(CASE WHEN event_type = 'purchase'
                          THEN CAST(ts AS DATE) END) AS dp
          FROM events WHERE ts IS NOT NULL GROUP BY user_id
        ), users AS (
          SELECT CAST(CASE WHEN dp IS NOT NULL
                      THEN date_diff('day', d0, dp)
                      ELSE date_diff('day', d0,
                                     (SELECT max(CAST(ts AS DATE))
                                      FROM events
                                      WHERE ts IS NOT NULL)) END
                      AS BIGINT) AS t,
                 CAST(CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END
                      AS BIGINT) AS is_event
          FROM per
        ), life AS (
          SELECT t, CAST(sum(is_event) AS BIGINT) AS d,
                 CAST(sum(1 - is_event) AS BIGINT) AS c
          FROM users GROUP BY t
        ), lt AS (
          SELECT t, d, c,
                 CAST((SELECT sum(d + c) FROM life)
                      - sum(d + c) OVER (ORDER BY t
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW)
                      + d + c AS BIGINT) AS at_risk
          FROM life
        )
        SELECT DISTINCT at_risk, d FROM lt WHERE d > 0 AND at_risk > d
        """
    ).fetchall()
    assert rows
    for n, d in rows:
        x = (math.log(float(n - d)) - math.log(float(n))) * 1e6
        assert _frac_margin(x) > _MARGIN, (
            f"KM boundary collision at {sf_dir}: "
            f"(ln({n - d})-ln({n}))*1e6 = {x!r}"
        )


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_user_entropy_term_boundaries(sf_dir):
    # event_user_type_entropy (batch-43): ln(n/c) per (user, type)
    con = _con(sf_dir)
    rows = con.execute(
        """
        WITH ct AS (
          SELECT user_id, event_type, count(*) AS c
          FROM events WHERE event_type IS NOT NULL
          GROUP BY user_id, event_type
        )
        SELECT DISTINCT sum(c) OVER (PARTITION BY user_id) AS n, c FROM ct
        """
    ).fetchall()
    assert rows
    for n, c in rows:
        x = math.log(float(n) / float(c)) * 1e6
        assert _frac_margin(x) > _MARGIN, (
            f"entropy boundary collision at {sf_dir}: "
            f"ln({n}/{c})*1e6 = {x!r}"
        )


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_geometric_mean_cents_boundaries(sf_dir):
    # agg_geometric_mean (batch-47): ln(cents) over every distinct cents
    con = _con(sf_dir)
    rows = con.execute(
        """
        SELECT DISTINCT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
        """
    ).fetchall()
    assert rows
    for (c,) in rows:
        if c <= 0:
            continue
        x = math.log(float(c)) * 1e6
        assert _frac_margin(x) > _MARGIN, (
            f"GM boundary collision at {sf_dir}: ln({c})*1e6 = {x!r}"
        )


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_unigram_surprisal_ratio_boundaries(sf_dir):
    # text_doc_surprisal_unigram (batch-50): ln(T/c) per corpus token
    con = _con(sf_dir)
    rows = con.execute(
        """
        WITH tok AS (
          SELECT unnest(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            x -> x <> '')) AS t
          FROM documents
        ), c AS (SELECT t, count(*) AS c FROM tok GROUP BY t)
        SELECT DISTINCT (SELECT sum(c) FROM c) AS total, c FROM c
        """
    ).fetchall()
    assert rows
    for total, c in rows:
        x = math.log(float(total) / float(c)) * 1e6
        assert _frac_margin(x) > _MARGIN, (
            f"unigram boundary collision at {sf_dir}: "
            f"ln({total}/{c})*1e6 = {x!r}"
        )


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_bm25_idf_boundaries(sf_dir):
    # text_bm25_score (batch-48): ln((2N-2df+1)/(2df+1)) per query term
    con = _con(sf_dir)
    rows = con.execute(
        """
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            x -> x <> '')) AS t
          FROM documents
        )
        SELECT (SELECT count(DISTINCT doc_id) FROM tok) AS n,
               count(DISTINCT doc_id) AS df
        FROM tok WHERE t IN ('spark', 'query', 'table') GROUP BY t
        """
    ).fetchall()
    assert rows
    for n, df in rows:
        x = math.log((2 * n - 2 * df + 1) / (2 * df + 1)) * 1e6
        assert _frac_margin(x) > _MARGIN, (
            f"BM25 idf boundary collision at {sf_dir}: N={n} df={df}"
        )


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_pmi_ratio_boundaries(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        """
        WITH st AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
          FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        ), sess AS (
          SELECT CAST(count(*) AS BIGINT) AS n_sessions
          FROM (SELECT DISTINCT user_id, day FROM st)
        ), singles AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS c
          FROM st GROUP BY event_type
        ), pairs AS (
          SELECT a.event_type AS type_x, b.event_type AS type_y,
                 CAST(count(*) AS BIGINT) AS n_xy
          FROM st a JOIN st b
            ON a.user_id = b.user_id AND a.day = b.day
           AND a.event_type < b.event_type
          GROUP BY 1, 2
        )
        SELECT DISTINCT p.n_xy * s.n_sessions AS num, sx.c * sy.c AS den
        FROM pairs p
        JOIN singles sx ON p.type_x = sx.event_type
        JOIN singles sy ON p.type_y = sy.event_type
        CROSS JOIN sess s
        """
    ).fetchall()
    assert rows
    for num, den in rows:
        x = math.log(float(num) / float(den)) * 1e6
        assert _frac_margin(x) > _MARGIN, (
            f"PMI boundary collision at {sf_dir}: "
            f"ln({num}/{den})*1e6 = {x!r}"
        )
