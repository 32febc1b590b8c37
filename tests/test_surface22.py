"""Batch-29 behavior (contract/surface22.py): each query against a
from-scratch Python recompute, plus the physical-plan assertions that pin
the scale-relevant shape (pushdown, WindowGroupLimit, shuffle-free)."""

from __future__ import annotations

import contextlib
import hashlib
import io
import statistics

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface22
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- H2H parser ---------------------------------------------------------------


def _reference_h2h(tokens: list[str]) -> list[tuple]:
    """The reference loop verbatim (app/team_utilities.py:113-123):
    six keys round-robin; once full, tokens of length <= 3 are skipped
    and the first longer token OPENS the next record as its date."""
    keys = ["c0", "c1", "c2", "c3", "c4", "c5"]
    records: list[dict] = []
    count_1 = 0
    for item in tokens:
        if count_1 <= 5:
            if count_1 == 0:
                records.append({})
            records[-1][keys[count_1]] = item
            count_1 += 1
        else:
            if len(item) > 3:
                records.append({"c0": item})
                count_1 = 1
            else:
                continue
    return [
        tuple(rec.get(k) for k in keys) for rec in records
    ]


def test_h2h_matches_reference_loop_on_fixture(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    expected = {}
    for doc_id, text in texts.items():
        toks = [t for t in text.strip().split() if t][: surface22._H2H_MAX_TOKS]
        if not toks:
            continue
        for rec_no, fields in enumerate(_reference_h2h(toks)):
            expected[(doc_id, rec_no)] = fields
    got = {
        (r["doc_id"], r["rec"]): tuple(r[f"c{i}"] for i in range(6))
        for r in surface22.parse_token_records_h2h(spark, sf_oracle).collect()
    }
    assert got == expected
    # the fixture corpus must actually exercise the skip path (short
    # garbage tokens between records)
    assert len(got) > len(texts)


def test_h2h_garbage_token_edge_cases(spark):
    """The reference's edge cases, hand-built: short tokens skipped
    between records, a length-4 NUMERIC token still opens a record
    (the reference checks len, not int-ness — quirk preserved), and a
    trailing partial record NULL-pads."""
    rows = [
        # rec0 = t0..t5; 'ab'/'x'/'999' skipped; '2024' (numeric, len 4)
        # opens rec1 with only 2 fields -> c2..c5 NULL
        (1, "01.01 liga home away 2 1 ab x 999 2024 cup"),
        # exactly one full record, nothing left
        (2, "02.02 liga2 h2 a2 0 0"),
        # only short tokens after the first record: no second record
        (3, "03.03 l3 h3 a3 1 1 a bb ccc"),
        # fewer than six tokens: single partial record
        (4, "04.04 l4 h4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rec"]): tuple(r[f"c{i}"] for i in range(6))
        for r in surface22.h2h_parse(df, "doc_id", "text").collect()
    }
    assert got == {
        (1, 0): ("01.01", "liga", "home", "away", "2", "1"),
        (1, 1): ("2024", "cup", None, None, None, None),
        (2, 0): ("02.02", "liga2", "h2", "a2", "0", "0"),
        (3, 0): ("03.03", "l3", "h3", "a3", "1", "1"),
        (4, 0): ("04.04", "l4", "h4", None, None, None),
    }


def test_h2h_plan_is_shuffle_free(spark, sf_oracle):
    plan = _formatted_plan(surface22.parse_token_records_h2h(spark, sf_oracle))
    assert "Exchange" not in plan, plan


# --- Count-Min sketch ---------------------------------------------------------


def test_countmin_never_undercounts_and_mass_conserved(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    true_counts: dict[str, int] = {}
    for r in docs.select("text").collect():
        for tok in (t for t in r["text"].split(" ") if t):
            true_counts[tok] = true_counts.get(tok, 0) + 1
    n_total = sum(true_counts.values())

    cells = {
        (r["j"], r["bucket"]): r["n"]
        for r in surface22.agg_countmin_sketch(spark, sf_oracle).collect()
    }
    # each sketch row is a partition of the full token mass
    for j in range(surface22._CM_DEPTH):
        assert sum(n for (jj, _b), n in cells.items() if jj == j) == n_total

    def bucket(j: int, tok: str) -> int:
        h = int(hashlib.md5(f"cm{j}:{tok}".encode()).hexdigest()[:4], 16)
        return h % surface22._CM_WIDTH

    # CM guarantee: estimate (min over rows) >= true count, for EVERY token
    overcounts = 0
    for tok, true_n in true_counts.items():
        est = min(
            cells.get((j, bucket(j, tok)), 0)
            for j in range(surface22._CM_DEPTH)
        )
        assert est >= true_n, (tok, est, true_n)
        overcounts += est - true_n
    # and it's a useful estimate, not saturated: average slack well under
    # the eN/w bound
    assert overcounts / len(true_counts) <= 2.72 * n_total / surface22._CM_WIDTH


# --- Markov transitions -------------------------------------------------------


def test_markov_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], r["event_type"])
        )
    counts: dict[tuple[str, str], int] = {}
    for lst in by_user.values():
        lst.sort()
        for (_, _, src), (_, _, dst) in zip(lst, lst[1:]):
            counts[(src, dst)] = counts.get((src, dst), 0) + 1
    from_totals: dict[str, int] = {}
    for (src, _), n in counts.items():
        from_totals[src] = from_totals.get(src, 0) + n

    got = {
        (r["src"], r["dst"]): (r["n"], r["p_r6"])
        for r in surface22.event_markov_transitions(spark, sf_oracle).collect()
    }
    assert set(got) == set(counts)
    for (src, dst), (n, p) in got.items():
        assert n == counts[(src, dst)]
        assert abs(p - round(n / from_totals[src], 6)) < 1e-12
    # probabilities per src sum to ~1
    for src in from_totals:
        s = sum(p for (s_, _), (_, p) in got.items() if s_ == src)
        assert abs(s - 1.0) < 1e-4


# --- MAD outliers -------------------------------------------------------------


def test_mad_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select("event_id", "user_id", "value").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["event_id"], r["value"]))
    expected = {}
    for _user, lst in by_user.items():
        med = statistics.median(v for _e, v in lst)
        mad = statistics.median(abs(v - med) for _e, v in lst)
        for eid, v in lst:
            expected[eid] = 1 if abs(v - med) > surface22._MAD_K * mad else 0
    got = {
        r["event_id"]: r["is_outlier"]
        for r in surface22.anomaly_mad_robust(spark, sf_oracle).collect()
    }
    assert got == expected
    assert 0 < sum(got.values()) < len(got)


def test_mad_joins_are_broadcast(spark, sf_oracle):
    plan = _formatted_plan(surface22.anomaly_mad_robust(spark, sf_oracle))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# --- row-group pruning scan ---------------------------------------------------


def test_rowgroup_prune_pushdown_and_values(spark, sf_oracle):
    """The date range must reach the parquet scan as PushedFilters, and
    the staged-sorted result must equal the same aggregate on the
    original table."""
    df = surface22.scan_rowgroup_prune(spark, sf_oracle)
    plan = _formatted_plan(df)
    assert "PushedFilters" in plan
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "l_shipdate" in ln
    ]
    assert pushed, plan

    li = load_table(spark, sf_oracle, "lineitem")
    lo = F.lit(surface22._PRUNE_LO).cast("date")
    hi = F.lit(surface22._PRUNE_HI).cast("date")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    direct = {
        r["l_returnflag"]: (r["n_lines"], r["revenue"])
        for r in li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
        )
        .collect()
    }
    got = {
        r["l_returnflag"]: (r["n_lines"], r["revenue"]) for r in df.collect()
    }
    assert got == direct and got


def test_staged_lineitem_is_sorted_within_files(spark, sf_oracle):
    """Every staged file must be internally sorted by l_shipdate — the
    property that makes row-group min/max stats disjoint and prunable."""
    path = surface22._staged_sorted_lineitem(spark, sf_oracle)
    staged = spark.read.schema(surface22._SORTED_LI_SCHEMA).parquet(path).select(
        F.input_file_name().alias("file"),
        F.col("l_shipdate").alias("d"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("file").orderBy(F.monotonically_increasing_id())
    violations = (
        staged.withColumn("prev", F.lag("d").over(w))
        .where(F.col("prev").isNotNull() & (F.col("d") < F.col("prev")))
        .count()
    )
    assert violations == 0


# --- gaps and islands ---------------------------------------------------------


def test_gap_islands_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select("user_id", F.to_date("ts").alias("day")).collect()
    days_by_user: dict[int, set] = {}
    for r in rows:
        days_by_user.setdefault(r["user_id"], set()).add(r["day"])
    expected = {}
    for user, days in days_by_user.items():
        ordered = sorted(days)
        runs = [1]
        for a, b in zip(ordered, ordered[1:]):
            if (b - a).days == 1:
                runs[-1] += 1
            else:
                runs.append(1)
        expected[user] = (len(runs), max(runs), sum(runs))
    got = {
        r["user_id"]: (r["n_islands"], r["longest_streak"], r["active_days"])
        for r in surface22.window_gap_islands(spark, sf_oracle).collect()
    }
    assert got == expected
    # fixture must exercise both gaps and streaks
    assert any(n > 1 for n, _l, _a in got.values())
    assert any(l > 1 for _n, l, _a in got.values())


# --- latest snapshot ----------------------------------------------------------


def test_latest_snapshot_matches_python_and_group_limit(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"),
        "event_id", "value",
    ).collect()
    best: dict[tuple, tuple] = {}
    for r in rows:
        key = (r["user_id"], r["event_type"])
        cand = (r["us"], r["event_id"], r["value"])
        if key not in best or cand[:2] > best[key][:2]:
            best[key] = cand
    expected = {k: (v[0], v[2]) for k, v in best.items()}
    df = surface22.dedup_latest_snapshot(spark, sf_oracle)
    got = {
        (r["user_id"], r["event_type"]): (r["last_ts_us"], r["last_value"])
        for r in df.collect()
    }
    assert got == expected
    # rank-1 predicate must push into the sort: one row of state per key
    assert "WindowGroupLimit" in _formatted_plan(df)


# --- train/test split ---------------------------------------------------------


def test_split_matches_python_and_shuffle_free(spark, sf_oracle):
    df = surface22.sample_train_test_split(spark, sf_oracle)
    got = {r["doc_id"]: r["split"] for r in df.collect()}

    def split_of(doc_id: int) -> str:
        h = int(
            hashlib.md5(
                (surface22._SPLIT_SEED + str(doc_id)).encode()
            ).hexdigest()[:4],
            16,
        ) % 100
        return "train" if h < 80 else ("valid" if h < 90 else "test")

    assert got == {d: split_of(d) for d in got}
    n = len(got)
    shares = {
        s: sum(1 for v in got.values() if v == s) / n
        for s in ("train", "valid", "test")
    }
    assert 0.7 < shares["train"] < 0.9
    assert 0.04 < shares["valid"] < 0.16
    assert 0.04 < shares["test"] < 0.16
    assert "Exchange" not in _formatted_plan(df)


# --- Pareto share -------------------------------------------------------------


def test_pareto_share_matches_python(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    rows = docs.select("doc_id", "lang", "n_chars").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((-r["n_chars"], r["doc_id"], r["n_chars"]))
    expected = {}
    for lang, lst in by_lang.items():
        lst.sort()
        total = sum(c for _n, _d, c in lst)
        cum = 0
        for _neg, doc_id, c in lst:
            cum += c
            expected[doc_id] = (cum, 1 if cum * 5 <= total * 4 else 0)
    got = {
        r["doc_id"]: (r["cum_chars"], r["in_top80"])
        for r in surface22.window_pareto_share(spark, sf_oracle).collect()
    }
    assert got == expected
    # flag must be a strict prefix in the size-desc order and non-trivial
    flags = sum(f for _c, f in got.values())
    assert 0 < flags < len(got)


# --- schema evolution ---------------------------------------------------------


def test_schema_evolution_merge_read(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    n_even = orders.where(F.col("o_orderkey") % 2 == 0).count()
    n_total = orders.count()
    got = {
        r["prio"]: r["n"]
        for r in surface22.scan_schema_evolution(spark, sf_oracle).collect()
    }
    assert got["(legacy)"] == n_even
    assert sum(got.values()) == n_total
    # the merged read must surface the evolved column for legacy files too
    path = surface22._staged_evolved_orders(spark, sf_oracle)
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
    assert "o_orderpriority" in merged.columns
    legacy_nulls = merged.where(
        (F.col("o_orderkey") % 2 == 0) & F.col("o_orderpriority").isNull()
    ).count()
    assert legacy_nulls == n_even
