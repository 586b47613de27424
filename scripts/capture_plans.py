#!/usr/bin/env python
"""Capture .explain("formatted") for the bench queries into plans/r06/.

Usage: python scripts/capture_plans.py before|after [query ...]
Writes plans/r06/<query>_<tag>.txt. Uses the same session config as bench.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_SET = [
    "kg_flagship_pipeline",
    "kg_extract_triples",
    "kg_connected_components",
    "kg_fuse_first_value",
    "kg_canonicalize_triples",
    "kg_fact_alignment",
    "rel_q1_pricing_summary",
    "rel_q3_top10",
    "rel_window_top_orders",
    "rel_events_sessionize",
    "doc_minhash_lsh_pairs",
    "doc_quality_features",
    "emb_cosine_topk",
]


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        raise SystemExit("usage: capture_plans.py before|after [query ...]")
    tag = sys.argv[1]
    names = sys.argv[2:] or BENCH_SET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from kgpipe_spark.session import get_spark

    spark = get_spark(
        app_name="kgpipe-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    queries = E.queries()
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"skip {name}: not registered")
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({tag})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
