"""Batch-30 behavior (contract/surface23.py): from-scratch recompute
twins + the plan assertions that pin each query's scale shape."""

from __future__ import annotations

import contextlib
import io
from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface23
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_corr_matrix_matches_numpy(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    rows = li.select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"], r["l_discount"])
        )
    got = {
        r["l_returnflag"]: r
        for r in surface23.agg_corr_matrix(spark, sf_oracle).collect()
    }
    assert set(got) == set(by_flag)
    for flag, triples in by_flag.items():
        arr = np.asarray(triples, dtype=np.float64)
        ref = np.corrcoef(arr.T)
        r = got[flag]
        assert r["n_rows"] == len(triples)
        # round-6 output vs float64 reference: agree to ~1e-6
        assert abs(r["corr_qty_price"] - ref[0, 1]) < 2e-6
        assert abs(r["corr_qty_disc"] - ref[0, 2]) < 2e-6
        assert abs(r["corr_price_disc"] - ref[1, 2]) < 2e-6
        for c in ("corr_qty_price", "corr_qty_disc", "corr_price_disc"):
            assert -1.0 <= r[c] <= 1.0


def test_cume_dist_matches_python(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    rows = docs.select("doc_id", "lang", "n_chars").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["n_chars"], r["doc_id"]))
    expected = {}
    for lang, lst in by_lang.items():
        n = len(lst)
        sizes = sorted(c for c, _d in lst)
        distinct_sorted = sorted(set(sizes))
        for c, d in lst:
            cd = sum(1 for s in sizes if s <= c) / n
            expected[d] = (round(cd, 6), distinct_sorted.index(c) + 1)
    got = {
        r["doc_id"]: (r["cd_r6"], r["drank"])
        for r in surface23.window_cume_dist(spark, sf_oracle).collect()
    }
    assert got == expected


def test_bitmask_masks_match_python_and_diverse_input(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select("user_id", "event_type").collect()
    expected: dict[int, int] = {}
    for r in rows:
        expected[r["user_id"]] = expected.get(r["user_id"], 0) | (
            1 << surface23._MASK_BITS[r["event_type"]]
        )
    got = {
        r["user_id"]: r["mask"]
        for r in surface23.user_bitmasks(ev).collect()
    }
    assert got == expected

    # the fixture is dense (every user hits every type) — prove the
    # encoding on a sparse hand-built stream too
    sparse = spark.createDataFrame(
        [(1, "view"), (1, "click"), (2, "purchase"), (3, "view"), (3, "view")],
        "user_id long, event_type string",
    )
    sparse_masks = {
        r["user_id"]: r["mask"]
        for r in surface23.user_bitmasks(sparse).collect()
    }
    assert sparse_masks == {1: 0b00011, 2: 0b01000, 3: 0b00001}


def test_zorder_morton_and_pruned_read(spark, sf_oracle):
    # Morton expression vs Python bit-interleave
    probe = spark.createDataFrame(
        [(u, d) for u in (0, 1, 5, 63) for d in (0, 1, 17, 31)],
        "u int, d int",
    )
    got = {
        (r["u"], r["d"]): r["z"]
        for r in probe.select(
            "u", "d", surface23._morton(F.col("u"), F.col("d")).alias("z")
        ).collect()
    }

    def morton_py(u: int, d: int) -> int:
        z = 0
        for i in range(surface23._Z_USER_BITS):
            z |= ((u >> i) & 1) << (2 * i)
        for i in range(surface23._Z_DAY_BITS):
            z |= ((d >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(u, d): morton_py(u, d) for (u, d) in got}

    # both dimensions of the predicate must reach the scan
    df = surface23.scan_zorder_prune(spark, sf_oracle)
    plan = _formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "ubucket" in pushed[0] and "dom" in pushed[0], plan

    # and the layout must not change results
    ev = load_table(spark, sf_oracle, "events")
    direct = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in ev.where(
            (F.pmod(F.col("user_id"), F.lit(64)) >= surface23._ZU_LO)
            & (F.pmod(F.col("user_id"), F.lit(64)) <= surface23._ZU_HI)
            & (F.dayofmonth("ts") >= surface23._ZD_LO)
            & (F.dayofmonth("ts") <= surface23._ZD_HI)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    got_agg = {r["event_type"]: (r["n"], r["sum_value"]) for r in df.collect()}
    assert got_agg == direct and got_agg


def test_rolling_minmax_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], r["value"])
        )
    expected = {}
    for lst in by_user.values():
        lst.sort()
        for i, (_us, eid, _v) in enumerate(lst):
            frame = [v for _u, _e, v in lst[max(0, i - surface23._ROLL_N + 1): i + 1]]
            cents = [round(v * 100) for v in frame]
            expected[eid] = (
                min(frame),
                max(frame),
                round(sum(cents) / 100.0 / len(frame), 6),
            )
    got = {
        r["event_id"]: (r["roll_min"], r["roll_max"], r["roll_avg_r6"])
        for r in surface23.window_rolling_minmax(spark, sf_oracle).collect()
    }
    assert set(got) == set(expected)
    for eid, (mn, mx, av) in expected.items():
        gmn, gmx, gav = got[eid]
        assert gmn == mn and gmx == mx
        assert abs(gav - av) < 1e-9, (eid, gav, av)


def test_embed_norm_hist_matches_numpy(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    rows = emb.select("embedding").collect()
    counts: Counter = Counter()
    for r in rows:
        prefix = np.asarray(
            r["embedding"][: surface23._NORM_PREFIX_DIMS], dtype=np.float64
        )
        ssq = int(sum(int(np.floor(x * x * 1e6 + 0.5)) for x in prefix))
        counts[int(np.floor(np.sqrt(float(ssq)) / 100.0 + 0.5))] += 1
    got = {
        r["norm_decis"]: r["n_vecs"]
        for r in surface23.embed_norm_hist(spark, sf_oracle).collect()
    }
    assert got == dict(counts)
    assert len(got) > 1  # prefix norms must actually spread


def test_hive_partition_prune_plan_and_values(spark, sf_oracle):
    df = surface23.scan_hive_partition_prune(spark, sf_oracle)
    plan = _formatted_plan(df)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "o_orderstatus" in pf[0], plan

    orders = load_table(spark, sf_oracle, "orders")
    direct = {
        r["o_orderpriority"]: (r["n"], r["sum_price"])
        for r in orders.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .collect()
    }
    got = {r["o_orderpriority"]: (r["n"], r["sum_price"]) for r in df.collect()}
    assert got == direct and got


def test_except_all_is_multiset_difference(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")

    def keys(y: int) -> Counter:
        rows = li.where(
            (F.col("l_shipdate") >= F.lit(f"{y}-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit(f"{y + 1}-01-01").cast("date"))
        ).select("l_partkey").collect()
        return Counter(r["l_partkey"] for r in rows)

    c96, c97 = keys(1996), keys(1997)
    expected = {k: n for k, n in (c96 - c97).items()}
    got = {
        r["l_partkey"]: r["n_surviving"]
        for r in surface23.setop_except_all(spark, sf_oracle).collect()
    }
    assert got == expected
    # multiset semantics must differ from DISTINCT EXCEPT somewhere:
    # some surviving key must keep multiplicity > 1
    assert any(n > 1 for n in got.values())


def test_batch2930_shuffle_budgets(spark, sf_oracle):
    """Pin each new query's exchange/window count — the shuffle budget
    that must survive a 100× scale-up.  Counts use the numbered plan
    nodes (formatted explain repeats nodes in its detail section)."""
    import re

    from historic_score_etl_pipeline_spark.contract import surface22

    def counts(df):
        plan = _formatted_plan(df)
        return (
            len(re.findall(r"\(\d+\) Exchange", plan)),
            len(re.findall(r"\(\d+\) Window", plan)),
        )

    budgets = {
        # one map-side-combined shuffle; the sketch table is tiny
        surface22.agg_countmin_sketch: (1, 0),
        # all ten sufficient statistics in ONE grouped pass
        surface23.agg_corr_matrix: (1, 0),
        # both windows (cumulative + total) share the lang partitioning
        surface22.window_pareto_share: (1, 2),
        # cume_dist + dense_rank share one Window exec
        surface23.window_cume_dist: (1, 1),
        # min/max/sum/count frames share one Window exec
        surface23.window_rolling_minmax: (1, 1),
        # strictly-preceding carry: one user shuffle, one sorted pass
        surface23.event_attribution_last_touch: (1, 1),
        # distinct(user, day) + user-keyed window/aggs: two shuffles
        surface22.window_gap_islands: (2, 1),
        # user-mask agg + <=2^5-row histogram: two tiny-reduce shuffles
        surface23.agg_bitmask_states: (2, 0),
        # lead window (user) + pair agg + src-share window
        surface22.event_markov_transitions: (3, 2),
    }
    for fn, (want_ex, want_win) in budgets.items():
        got = counts(fn(spark, sf_oracle))
        assert got == (want_ex, want_win), (fn.__name__, got)


def test_attribution_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], r["event_type"])
        )
    expected = {}
    for lst in by_user.values():
        lst.sort()
        last_click = None  # (us, event_id)
        for us, eid, etype in lst:
            if etype == "purchase":
                expected[eid] = (
                    (last_click[1], us - last_click[0])
                    if last_click
                    else (None, None)
                )
            if etype == "click":
                last_click = (us, eid)
    got = {
        r["event_id"]: (r["attr_click_id"], r["gap_us"])
        for r in surface23.event_attribution_last_touch(spark, sf_oracle).collect()
    }
    assert got == expected
    attributed = [v for v in got.values() if v[0] is not None]
    assert attributed and all(gap > 0 for _c, gap in attributed)
