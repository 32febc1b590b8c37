"""B8 scheduler-predicate gate (app/main.py:19,50-53) — pure function, no
oracle needed (SURVEY.md §2B-B8)."""

from __future__ import annotations

import datetime as dt

from historic_score_etl_pipeline_spark.plans.scheduler import (
    is_extraction_day,
    is_worker_dyno,
    should_run,
)


def test_even_day_gate():
    assert is_extraction_day(dt.date(2023, 5, 2))
    assert is_extraction_day(dt.date(2023, 5, 30))
    assert not is_extraction_day(dt.date(2023, 5, 1))
    assert not is_extraction_day(dt.date(2023, 5, 31))


def test_runs_tile_the_month_except_after_31_day_months():
    # run day d covers d and d+1, so days 2..31 of any month are covered
    # by a same-month run; day 1 is covered only when the PREVIOUS month
    # ended on an even day (30-day months), a real gap in the reference's
    # schedule (app/main.py:19) the engine reproduces faithfully.
    for day in range(2, 31):
        d = dt.date(2023, 6, day)
        covered = is_extraction_day(d) or is_extraction_day(
            d - dt.timedelta(days=1)
        )
        assert covered, d
    assert is_extraction_day(dt.date(2023, 7, 1) - dt.timedelta(days=1))  # Jun 30
    assert not is_extraction_day(dt.date(2023, 6, 1) - dt.timedelta(days=1))  # May 31


def test_dyno_gate():
    assert is_worker_dyno({"DYNO": "run.1"})
    assert is_worker_dyno({"DYNO": "scheduler.7"})
    assert not is_worker_dyno({"DYNO": "web.1"})
    # missing DYNO: reference crashes on None; engine says "not a worker"
    assert not is_worker_dyno({})


def test_combined_gate():
    env = {"DYNO": "run.1"}
    assert should_run(dt.date(2023, 5, 2), env)
    assert not should_run(dt.date(2023, 5, 3), env)
    assert not should_run(dt.date(2023, 5, 2), {"DYNO": "web.1"})
