"""Non-UTC-host regression tests for the stateful-window timeout epoch math.

applyInPandasWithState grouping keys reach Python through the non-Arrow
``TimestampType.fromInternal`` = ``datetime.fromtimestamp`` (OS-LOCAL tz;
``spark.sql.session.timeZone`` does not control that path). The round-9
code read the naive key back with ``pd.Timestamp(...).timestamp()`` (UTC),
so on a west-of-UTC host every window-close timeout was armed hours EARLY
and live Space-Saving / anchor state was evicted mid-window. These tests
run the conversion (and the full eviction scenario) under a non-UTC TZ.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys
import time

import pytest

WEST_TZ = "America/Los_Angeles"  # UTC-8 — the early-eviction direction


@pytest.fixture()
def la_tz():
    old = os.environ.get("TZ")
    os.environ["TZ"] = WEST_TZ
    time.tzset()
    yield
    if old is None:
        os.environ.pop("TZ", None)
    else:
        os.environ["TZ"] = old
    time.tzset()


def test_window_key_epoch_ms_inverts_fromInternal_on_non_utc_host(la_tz):
    """The helper must invert the exact conversion PySpark applied to the
    key: epoch -> datetime.fromtimestamp (OS-local naive) -> helper ->
    the same epoch, regardless of host TZ. pd.Timestamp().timestamp()
    (the round-9 code) is off by the UTC offset here (-8h/-7h)."""
    import pandas as pd

    from epic_pandas_spark.streaming.stateful import _window_key_epoch_ms

    for epoch_s in (1_767_225_600, 1_751_328_000):  # 2026-01-01, 2025-07-01 (DST)
        key = dt.datetime.fromtimestamp(epoch_s)  # what fromInternal produces
        assert _window_key_epoch_ms(key) == epoch_s * 1000
        # and the bug really was a bug on this host: naive-as-UTC is shifted
        assert int(pd.Timestamp(key).timestamp() * 1000) != epoch_s * 1000


def test_window_key_epoch_ms_dst_transition_hours(la_tz):
    """The DST transition hours themselves (the round-10 advisory gap):

    - FALL-BACK (2025-11-02 01:30 PDT/PST): fromInternal collapses TWO
      UTC instants onto one naive local key; ``timetuple()`` hands
      mktime ``tm_isdst=-1`` and it guesses the fold. The helper must
      resolve it deterministically to the LATER epoch (early timeouts
      evict live window state; late ones just hold it an extra hour) —
      and that epoch must round-trip back to the key.
    - SPRING-FORWARD neighborhood: unambiguous instants right around
      the gap must still invert exactly.
    """
    from epic_pandas_spark.streaming.stateful import _window_key_epoch_ms

    # 2025-11-02 08:30 UTC = 01:30 PDT (first pass) and 09:30 UTC =
    # 01:30 PST (second pass) — identical naive local keys.
    first, second = 1_762_072_200, 1_762_075_800
    k1 = dt.datetime.fromtimestamp(first)
    k2 = dt.datetime.fromtimestamp(second)
    assert k1 == k2, "fold instants must collapse to one naive key"
    got = _window_key_epoch_ms(k1)
    assert got == second * 1000  # deterministic: the LATER (PST) instant
    assert dt.datetime.fromtimestamp(got // 1000) == k1  # round-trips
    # spring-forward 2025-03-09: 01:59:59 PST and 03:00:00 PDT straddle
    # the nonexistent 02:xx hour; both are unambiguous and must invert.
    for epoch_s in (1_741_513_199, 1_741_513_200):
        key = dt.datetime.fromtimestamp(epoch_s)
        assert _window_key_epoch_ms(key) == epoch_s * 1000


_SCENARIO = r"""
import datetime as dt
import json
import sys
import time

assert time.timezone != 0, "TZ override did not take (host still UTC)"

from epic_pandas_spark.session import get_spark
from epic_pandas_spark.streaming.stateful import windowed_topk

tmp = sys.argv[1]
spark = get_spark(
    app_name="tz_evict_check", master="local[2]", shuffle_partitions=2
)
base = dt.datetime(2026, 1, 1, 0, 0, 0)
path = tmp + "/src"

def write(rows):
    spark.createDataFrame(rows, "ts timestamp, event_type string").coalesce(
        1
    ).write.mode("append").parquet(path)

n_a, n_d = 20, 7
write([(base + dt.timedelta(seconds=i), "t%d" % (i % 3)) for i in range(n_a)])
src = (
    spark.readStream.schema("ts timestamp, event_type string")
    .option("maxFilesPerTrigger", "1")
    .parquet(path)
)
q = (
    windowed_topk(src, k=3, m=8, window_size="1 hour", watermark="2 hours")
    .writeStream.outputMode("update")
    .format("memory")
    .queryName("tz_out")
    .start()
)
try:
    q.processAllAvailable()  # batch 1: window A gets n_a events, wm=0
    # batch 2: advance watermark to base+30m — still BEFORE window A's
    # close (base+1h). Under the UTC-read bug, A's timeout was armed ~8h
    # early, so any watermark movement past it is enough to evict A.
    write([(base + dt.timedelta(hours=2, minutes=30, seconds=i), "z") for i in range(3)])
    q.processAllAvailable()
    # batch 3: wm=base+30m during this batch — buggy code fires A's
    # timeout here; correct code keeps A (close > wm).
    write([(base + dt.timedelta(hours=2, minutes=40, seconds=i), "z") for i in range(3)])
    q.processAllAvailable()
    # batch 4: in-watermark window-A events (base+50m > wm=base+40m).
    # Correct: they continue A's counters -> n_seen = n_a + n_d.
    write([(base + dt.timedelta(minutes=50, seconds=i), "t0") for i in range(n_d)])
    q.processAllAvailable()
    seen = sorted(
        int(r["n_seen"])
        for r in spark.sql(
            "SELECT DISTINCT n_seen FROM tz_out WHERE window_start = ?", args=[base]
        ).collect()
    )
    print("RESULT " + json.dumps({"seen": seen, "n_a": n_a, "n_d": n_d}))
finally:
    q.stop()
    spark.stop()
"""


def test_windowed_topk_state_survives_to_true_close_on_west_host(tmp_path):
    """End-to-end eviction scenario in a fresh JVM whose OS TZ is UTC-8:
    window state must survive until the watermark truly passes the
    window close, and in-watermark re-arrivals must CONTINUE the
    counters (n_seen = n_a + n_d). Round-9 code evicted at watermark+1
    and restarted the count at n_d."""
    env = dict(os.environ)
    env["TZ"] = WEST_TZ
    env.pop("SPARK_GRAFT_EVIDENCE_LOCK", None)
    p = subprocess.run(
        [sys.executable, "-c", _SCENARIO, str(tmp_path)],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
        timeout=600,
    )
    assert p.returncode == 0, f"scenario failed:\n{p.stdout[-3000:]}\n{p.stderr[-3000:]}"
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    seen, n_a, n_d = set(res["seen"]), res["n_a"], res["n_d"]
    assert n_a in seen
    assert n_a + n_d in seen, (
        f"window state was evicted before its true close on a UTC-8 host: {seen}"
    )
    assert n_d not in seen, f"counters restarted mid-window: {seen}"
