"""Relational operators composed from DataFrame primitives.

`diff_sync` is the engine's centerpiece: the reference hand-writes the
incoming-vs-existing insert/update/delete/match classification five
times (gene assocs, xdb ids, map positions, hgvs names, aliases —
SURVEY J3-J7) plus the variant upsert itself (J10); here it is one
generic operator instantiated with (key columns, compare columns).
"""

from clinvar_pipeline_spark.operators.diff_sync import apply_diff, diff_sync
from clinvar_pipeline_spark.operators.cascade import cascade_lookup
from clinvar_pipeline_spark.operators.guarded_delete import guarded_stale_delete

__all__ = ["apply_diff", "cascade_lookup", "diff_sync", "guarded_stale_delete"]
