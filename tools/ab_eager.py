#!/usr/bin/env python
"""A/B the eager-persist switch per query: noop-sink min-of-warm at
the current $SPARK_GRAFT_CPUS core count. One process per mode (the
master is fixed per session); SPARK_GRAFT_LAZY_PERSIST=1 disables the
eager count() inside register_persist.

Usage: SPARK_GRAFT_CPUS=8 python tools/ab_eager.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab-eager")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        fn = registry[name]
        ts = []
        for _ in range(4):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            q.release_cached()
        out[name] = {"cold": ts[0], "warm": min(ts[1:]), "passes": ts}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
