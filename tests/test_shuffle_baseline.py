"""Shuffle-bytes regression gate (tools/shuffle_baseline.py).

Two layers: the compare() threshold logic is pinned as a pure
function, and the measurement path is pinned end-to-end in a
subprocess session (the shared test session keeps the UI status store
off) by forcing a broadcast join to decay into a shuffle join — the
exact regression class the gate exists to catch — and asserting the
gate trips on it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from shuffle_baseline import FLOOR, compare  # noqa: E402


def test_compare_thresholds():
    base = {
        "a": {"shuffle_write": 1000, "shuffle_read": 1000},
        "b": {"shuffle_write": 100 * FLOOR, "shuffle_read": 100 * FLOOR},
    }
    # small absolute jitter on a tiny baseline: under the floor, ok
    ok = {"a": {"shuffle_write": 2000, "shuffle_read": 500}}
    assert compare(base, ok) == []
    # ratio regression on a large baseline trips
    regr = {"b": {"shuffle_write": 140 * FLOOR, "shuffle_read": 100 * FLOOR}}
    assert compare(base, regr) == ["b"]
    # read-side regression alone also trips
    regr_r = {"b": {"shuffle_write": 100 * FLOOR, "shuffle_read": 140 * FLOOR}}
    assert compare(base, regr_r) == ["b"]
    # improvements never fail
    better = {"b": {"shuffle_write": FLOOR, "shuffle_read": FLOOR}}
    assert compare(base, better) == []
    # unknown names are the tool's "missing", not compare()'s concern
    assert compare(base, {"new": {"shuffle_write": 10**12, "shuffle_read": 0}}) == []


_PROBE = r"""
import json, sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(tools)r)
from shuffle_baseline import measure, compare
from clinvar_pipeline_spark import queries as q
from clinvar_pipeline_spark.session import get_spark

spark = get_spark(
    app_name="shuffle-tripwire",
    master="local[4]",
    shuffle_partitions="4",
    extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "200000",
        "spark.ui.port": "4777",
    },
)
spark.sparkContext.setLogLevel("ERROR")
reg = q.queries()
sf = "/root/testdata/sf0.01"
base = measure(spark, reg, ["customer_distribution"], sf, q.release_cached)
# decay every broadcast into a shuffle join: the regression class the
# gate exists for (runtime SQLConf, also feeds AQE's broadcast demote)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
try:
    regr = measure(spark, reg, ["customer_distribution"], sf, q.release_cached)
finally:
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
# the floor exists for noise, not for real joins: compare with floor=0
# (sf0.01's absolute volumes are tiny) but keep the real ratio
print(json.dumps({
    "base": base, "regr": regr,
    "tripped": compare(base, regr, floor=0),
}))
"""


def test_broadcast_decay_trips_gate():
    code = _PROBE % {"repo": REPO, "tools": os.path.join(REPO, "tools")}
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["tripped"] == ["customer_distribution"], out
    # the decay is not marginal: a shuffle join moves the probe side
    base_w = out["base"]["customer_distribution"]["shuffle_write"]
    regr_w = out["regr"]["customer_distribution"]["shuffle_write"]
    assert regr_w > 4 * max(base_w, 1), (base_w, regr_w)
