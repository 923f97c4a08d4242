"""Round-11 wave 1: the Int64-before-mask precision fix for the
bucketed cogrouped as-of join (round-10 advice, medium) plus its
float64-promotion tripwire."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_asof_cogrouped_preserves_ids_above_2_53(spark):
    """Round-10 advice (medium): `.where(...)` on an ndarray-backed
    int64 Series promotes to float64 BEFORE `.astype("Int64")`, so
    click event_ids above 2^53 were silently rounded even though the
    docstring claimed otherwise (fixture ids are small, so the gates
    never caught it). The fix converts to nullable Int64 first, then
    masks; this fixture uses consecutive ids just past 2^53 — ids that
    collide under float64 rounding — and asserts each purchase sees its
    own exact prior click id."""
    from mapreduce_golang_spark.operators.analytics import (
        last_click_before_purchase,
        last_click_before_purchase_cogrouped,
    )

    base = 2**53  # 9007199254740992: float64 can no longer represent +1
    rows = [
        # user 1: click id base+1 (odd — unrepresentable in float64,
        # rounds to base) then purchase
        (1, base + 1, "click", "2024-01-01 00:00:01"),
        (1, base + 2, "purchase", "2024-01-01 00:00:05"),
        # user 2: click id base+3 (rounds to base+4 under float64)
        (2, base + 3, "click", "2024-01-01 00:00:02"),
        (2, base + 4, "purchase", "2024-01-01 00:00:06"),
        # user 3: purchase-only — the fillna(-1) path must coexist with
        # huge ids in the same Int64 column
        (3, base + 5, "purchase", "2024-01-01 00:00:03"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts_s string"
    ).select("user_id", "event_id", "event_type", F.to_timestamp("ts_s").alias("ts"))

    got = {
        r.purchase_event_id: r.last_click_event_id
        for r in last_click_before_purchase_cogrouped(ev).collect()
    }
    assert got == {base + 2: base + 1, base + 4: base + 3, base + 5: -1}

    # and the cogrouped form still matches the window form row-for-row
    want = sorted(map(tuple, last_click_before_purchase(ev).collect()))
    have = sorted(map(tuple, last_click_before_purchase_cogrouped(ev).collect()))
    assert have == want


def test_scratch_dir_registers_for_exit_cleanup():
    """scratch_dir must mint a real dir and register it so the atexit
    sweep removes it — the round-10 advice #4 leak defense. The sweep
    is exercised against THIS test's dir only: draining the global
    registry would delete scratch dirs backing other tests'
    not-yet-materialized DataFrames in the same pytest process."""
    import os

    from mapreduce_golang_spark import tempdirs

    d = tempdirs.scratch_dir("mr_spark_test_")
    assert os.path.isdir(d) and d in tempdirs._REGISTERED
    others = [x for x in tempdirs._REGISTERED if x != d]
    del tempdirs._REGISTERED[:]
    tempdirs._REGISTERED.append(d)
    try:
        tempdirs._cleanup()
        assert not os.path.exists(d) and not tempdirs._REGISTERED
    finally:
        tempdirs._REGISTERED.extend(others)


def test_no_bare_mkdtemp_in_operator_paths():
    """Standing audit (round-11 discipline): work dirs minted by
    graded-query paths must go through tempdirs.scratch_dir so they
    are removed at interpreter exit — a bare tempfile.mkdtemp in the
    package or the entry module re-opens the /tmp leak the round-10
    advice closed. session.py's package-archive dir is exempt by
    design (process-lifetime, one per session)."""
    import pathlib
    import re

    import mapreduce_golang_spark

    root = pathlib.Path(mapreduce_golang_spark.__file__).parent
    offenders = []
    for p in sorted(root.rglob("*.py")):
        if p.name in ("tempdirs.py", "session.py"):
            continue
        if re.search(r"tempfile\.mkdtemp\(", p.read_text()):
            offenders.append(str(p.relative_to(root)))
    entry = root.parent / "__spark_entry__.py"
    if re.search(r"tempfile\.mkdtemp\(", entry.read_text()):
        offenders.append("__spark_entry__.py")
    assert not offenders, offenders
