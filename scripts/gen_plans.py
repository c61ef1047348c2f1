"""Regenerate PLANS.md: a one-line physical-plan fingerprint per
registry query (exchange count, join strategies, window group-limits,
scan column counts) plus the audit flags the engine promises to keep
at zero (cartesian products, single-partition exchanges, unbounded
global sorts).

Run:  python scripts/gen_plans.py   (rewrites PLANS.md at the repo root)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


_REDUCERS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "Limit",
    "Deduplicate",
)


def _broadcasts_raw_fact(exec_plan: str, fact: str = "lineitem.parquet") -> bool:
    """True if any BroadcastExchange subtree contains an UNREDUCED scan
    of the fact table — hash-building the biggest relation is the plan
    that dies at 100 TB (smaller sides like orders/events building
    under a fact probe are the intended orientation; AQE swaps them to
    sort-merge when they outgrow the threshold)."""

    def depth(line: str) -> int:
        m = re.search(r"[:+]-", line)
        return m.start() if m else -1

    lines = exec_plan.splitlines()
    for i, l in enumerate(lines):
        if "BroadcastExchange" not in l:
            continue
        d = depth(l)
        sub = []
        for j in range(i + 1, len(lines)):
            dj = depth(lines[j])
            if dj >= 0 and dj <= d:
                break
            sub.append(lines[j])
        txt = "\n".join(sub)
        if fact in txt and not any(r in txt for r in _REDUCERS):
            return True
    return False


def fingerprint(plan: str, exec_plan: str) -> dict:
    tree = plan.split("\n\n(")[0]
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    scan_cols = [len(s.split(",")) if s else 0 for s in scans]
    return {
        "exchanges": tree.count("Exchange"),
        "bhj": tree.count("BroadcastHashJoin"),
        "smj": tree.count("SortMergeJoin"),
        "wgl": tree.count("WindowGroupLimit"),
        "topk": tree.count("TakeOrderedAndProject"),
        "scans": f"{len(scan_cols)} scan(s), cols {scan_cols}",
        "flags": "; ".join(
            p
            for p, bad in [
                ("CARTESIAN", "CartesianProduct" in tree),
                ("SINGLE-PARTITION", "Exchange SinglePartition" in tree),
                (
                    "GLOBAL-SORT",
                    "Exchange rangepartitioning" in plan
                    and "TakeOrderedAndProject" not in tree,
                ),
                ("FACT-BROADCAST", _broadcasts_raw_fact(exec_plan)),
            ]
            if bad
        )
        or "-",
    }


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in sorted(entry.queries().items()):
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        exec_plan = df._jdf.queryExecution().executedPlan().toString()
        rows.append((name, fingerprint(buf.getvalue(), exec_plan)))

    out = [
        "# PLANS — physical-plan fingerprints (generated)",
        "",
        f"One line per registry query at `{SF_DIR}`; regenerate with",
        "`python scripts/gen_plans.py`. The audit columns must stay",
        "clean: no cartesian products, no single-partition exchanges,",
        "no unbounded global sorts, and no broadcast hash-build of an",
        "unreduced lineitem (fact) scan — the fact must always be the",
        "streamed probe side (smaller sides building under it is the",
        "intended orientation; AQE swaps them to sort-merge at scale).",
        "Pinned per-query in `tests/test_plans.py`; swept here across",
        "the whole registry.",
        "",
        "| query | exchanges | broadcast joins | sort-merge joins |"
        " window group-limits | top-k | scans | audit flags |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, f in rows:
        out.append(
            f"| {name} | {f['exchanges']} | {f['bhj']} | {f['smj']} "
            f"| {f['wgl']} | {f['topk']} | {f['scans']} | {f['flags']} |"
        )
    flagged = [n for n, f in rows if f["flags"] != "-"]
    out += ["", f"**{len(rows)} queries; {len(flagged)} flagged**"
            + (f": {flagged}" if flagged else ".")]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"PLANS.md: {len(rows)} queries, {len(flagged)} flagged")


if __name__ == "__main__":
    main()
