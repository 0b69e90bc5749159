#!/usr/bin/env python3
"""Interleaved jar A/B bench: runs graft.Bench alternately from two
compiled trees (A = a prior round's commit, B = HEAD) N times each in one
session, pairs per-query medians, and writes BENCH_AB.json. This is the
only trustworthy cross-round perf signal on a shared sandbox — committed
BENCH_FULL totals for a byte-identical jar have varied 74 -> 99 s on load
alone (r13/r14).

Usage: python3 tools/bench_ab.py <treeA> <labelA> <treeB> <labelB> [reps]
Runs from the repo root; needs /root/testdata/sf0.1.
"""
import json
import os
import statistics
import subprocess
import sys

OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def run_bench(tree, out_path, threads="32"):
    cp = f"{tree}/target/scala-2.13/classes:/opt/spark/jars/*"
    cmd = ["java"]
    for p in OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Xmx8g", "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Bench"]
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS=threads,
               SPARK_GRAFT_BENCH_OUT=out_path)
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=1800)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-2000:])
        raise SystemExit(f"bench failed in {tree}")
    with open(out_path) as f:
        return json.load(f)


def main():
    tree_a, label_a, tree_b, label_b = sys.argv[1:5]
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    runs = {label_a: [], label_b: []}
    # strict interleave: A B A B ... so slow environment drift hits both
    for i in range(reps):
        for tree, label in ((tree_a, label_a), (tree_b, label_b)):
            out = f"/tmp/bench_ab_{label}_{i}.json"
            d = run_bench(tree, out)
            runs[label].append(d)
            print(f"[ab] {label} rep {i + 1}/{reps}: total {d['value']:.1f}s "
                  f"load_end={d.get('env', {}).get('load_avg_end', -1)}",
                  flush=True)
    qs_a = set(runs[label_a][0]["queries"])
    qs_b = set(runs[label_b][0]["queries"])
    # queries that FAILED in any rep of a tree are excluded from that
    # comparison: a fast crash otherwise reads as a speedup (the Bench
    # artifact records failures explicitly since r16)
    failed = {q for lab in runs for r in runs[lab] for q in r.get("failed", [])}
    common = (qs_a & qs_b) - failed
    # queries present in only one tree (renames, new operators) are not
    # silently dropped — they are listed so a one-sided regression is
    # visible in the artifact even though it cannot enter the ratio
    only = sorted(qs_a ^ qs_b)
    if not common:
        raise SystemExit(
            f"no common non-failed queries between trees (failed={sorted(failed)}, "
            f"one-sided={only}) — nothing to compare")
    med = {}
    for q in sorted(common):
        med[q] = {
            label_a: round(statistics.median(
                r["queries"][q] for r in runs[label_a]), 3),
            label_b: round(statistics.median(
                r["queries"][q] for r in runs[label_b]), 3),
        }
    tot_a = round(sum(v[label_a] for v in med.values()), 2)
    tot_b = round(sum(v[label_b] for v in med.values()), 2)
    worst = max(common, key=lambda q: med[q][label_b] - med[q][label_a])

    def commit_of(tree):
        try:
            return subprocess.run(["git", "-C", tree, "rev-parse", "--short", "HEAD"],
                                  capture_output=True, text=True, timeout=10
                                  ).stdout.strip() or "unknown"
        except Exception:
            return "unknown"
    out = {
        "metric": "bench_ab",
        f"{label_a}_commit": commit_of(tree_a),
        f"{label_b}_commit": commit_of(tree_b),
        "method": (f"interleaved A/B: {label_a} and {label_b} trees run "
                   f"alternately {reps}x each in one session, identical JVM "
                   "flags (JDK17 add-opens, -Xmx8g, local[32], "
                   "shuffle.partitions=32), sf0.1, per-query value = median "
                   f"of {reps}; env stamps per rep recorded"),
        "common_queries": len(common),
        "excluded_failed": sorted(failed),
        "one_sided_queries": only,
        f"{label_a}_total_sec": tot_a,
        f"{label_b}_total_sec": tot_b,
        f"ratio_{label_b}_over_{label_a}": round(tot_b / tot_a, 4),
        "per_rep_totals": {
            lab: [round(r["value"], 1) for r in runs[lab]] for lab in runs},
        "per_rep_env": {
            lab: [r.get("env", {}) for r in runs[lab]] for lab in runs},
        "max_regression": {
            "query": worst,
            "delta_sec": round(med[worst][label_b] - med[worst][label_a], 2)},
        "per_query_median": med,
    }
    with open("BENCH_AB.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"[ab] {label_a} {tot_a}s vs {label_b} {tot_b}s "
          f"ratio {tot_b / tot_a:.4f} -> BENCH_AB.json")


if __name__ == "__main__":
    main()
