#!/usr/bin/env python
"""Observability for the documented skew caps (no silent truncation).

Thin wrapper over clinvar_pipeline_spark.audit.skew_report — also
available as ``python -m clinvar_pipeline_spark --audit``.

Usage: python tools/skew_report.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from clinvar_pipeline_spark.audit import skew_report
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="skew-report")
    spark.sparkContext.setLogLevel("ERROR")
    for line in skew_report(spark, args.sf):
        print(line)


if __name__ == "__main__":
    main()
