"""Job-trigger gate (SURVEY.md §2B-B8).

The reference runs its pipeline only when BOTH gates pass:

* a date gate — ``(today.day % 2) == 0`` (``app/main.py:19``): extraction
  happens on even-numbered days of the month, matching the 2-day incremental
  horizon (today + tomorrow) so consecutive runs tile the calendar;
* a worker gate — the Heroku ``DYNO`` env var must contain ``'run'`` or
  ``'scheduler'`` (``app/main.py:50-53``), i.e. only worker/scheduler dynos
  execute, never e.g. a web dyno.

These are *scheduler predicates*, not data operators — on a cluster they
live in the orchestrator (Airflow schedule / cron guard), so the engine
ships them as a pure function the job wrapper calls before building any
plan.  No oracle needed: pure Python, unit-tested directly.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Mapping


def is_extraction_day(today: _dt.date) -> bool:
    """Date gate: run on even days of the month (app/main.py:19)."""
    return today.day % 2 == 0


def is_worker_dyno(env: Mapping[str, str]) -> bool:
    """Worker gate: DYNO contains 'run' or 'scheduler' (app/main.py:50-53).

    The reference crashes on a missing DYNO (``None`` is not iterable);
    the engine treats missing as "not a worker" instead — deliberately not
    reproducing the crash, like the ``app/ref_utilities.py:240`` wrong-frame
    bug (see sinks/writer.py).
    """
    dyno = env.get("DYNO") or ""
    return ("run" in dyno) or ("scheduler" in dyno)


def should_run(today: _dt.date, env: Mapping[str, str]) -> bool:
    """Combined job gate: both the date and the worker predicate."""
    return is_worker_dyno(env) and is_extraction_day(today)
