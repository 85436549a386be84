#!/usr/bin/env python
"""Physical-plan audit over the whole query registry.

Thin wrapper over clinvar_pipeline_spark.audit.explain_audit (see its
docstring for the smell catalog and waiver table) — also available as
``python -m clinvar_pipeline_spark --audit``.

Usage: python tools/explain_audit.py [--sf DIR] [--show] [name ...]
Exit code 1 if any un-waivered smell is found.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show", action="store_true", help="print full plans")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from clinvar_pipeline_spark.audit import explain_audit
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad = explain_audit(spark, args.sf, args.names or None, show=args.show)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
