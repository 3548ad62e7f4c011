#!/usr/bin/env python3
"""Regenerate SCALE.md's per-query plan-audit table from ExplainPlans
output: sbt "runMain graft.ExplainPlans" > explain.log, then
python3 tools/gen_scale.py explain.log > the table body."""
import re
import sys

log = open(sys.argv[1], encoding="utf-8", errors="replace").read()
# strip ANSI escapes and sbt [info]/[error] prefixes
log = re.sub(r"\x1b\[[0-9;]*[A-Za-z]", "", log)
log = re.sub(r"^\[\w+\]\s?", "", log, flags=re.M)
blocks = re.split(r"^===== (\S+) =====\s*$", log, flags=re.M)[1:]
raw_pairs = list(zip(blocks[::2], blocks[1::2]))
# Spark's formatted explain emits its own "===== Subqueries =====" section
# header, which the split above turns into an orphan pseudo-query; fold
# each such section back into the query it belongs to, so a query's row
# counts include its subquery plans (e.g. q_incremental_dedup's
# ScalarSubquery split).
pairs = []
for name, plan in raw_pairs:
    if name == "Subqueries" and pairs:
        pairs[-1] = (pairs[-1][0], pairs[-1][1] + plan)
    else:
        pairs.append((name, plan))

print("| query | shuffles | bcast | BHJ | SMJ | BNLJ | cartesian "
      "| top-k | pushed scans |")
print("|---|---|---|---|---|---|---|---|---|")
for name, plan in sorted(pairs):
    def n(pat):
        return len(re.findall(pat, plan))
    shuffles = n(r"\bExchange hashpartitioning|\bExchange rangepartitioning|"
                 r"\(\d+\) Exchange")
    bcast = n(r"BroadcastExchange|\bExchange SinglePartition")
    bhj = n(r"BroadcastHashJoin")
    smj = n(r"SortMergeJoin")
    bnlj = n(r"BroadcastNestedLoopJoin")
    cart = n(r"CartesianProduct")
    topk = n(r"TakeOrderedAndProject")
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    print(f"| {name} | {shuffles} | {bcast} | {bhj} | {smj} | {bnlj} "
          f"| {cart} | {topk} | {pushed} |")
