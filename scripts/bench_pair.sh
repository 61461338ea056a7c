#!/usr/bin/env bash
# Back-to-back full-bench PAIR at one HEAD — the round-17 judge item 2
# done criterion: the driver's single run and the builder's settle had
# drifted 25% apart because machine-wide noise bursts outlast the
# bench's own min-of-3, so the bench grew prev-anchored retries and
# inter-query cooldowns. This protocol measures whether that worked:
# two consecutive FULL runs, and the artifact records every query whose
# cross-run max/min ratio exceeds 1.5 (healthy = <=3 such queries;
# before the fix: ~10).
#
# Usage: scripts/bench_pair.sh   (env: SPARK_GRAFT_SF_DIR,
#        SPARK_GRAFT_CPUS, SPARK_GRAFT_ROUND) -> writes
#        BENCH_PAIR_r{N}.json
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-32}

# Pin the round ONCE, before run 1, and feed the same value to both
# Bench invocations and the artifact names below. Each Bench run used
# to infer its own round from BENCH_r*.json at its start: a driver
# stamp landing mid-pair (or running the script mid-round) made run 2
# anchor on run 1's output and the script's artifacts collide with a
# different round than the Bench-written ones.
if [[ -z "${SPARK_GRAFT_ROUND:-}" ]]; then
  SPARK_GRAFT_ROUND=$(python3 - <<'PYEOF'
import glob, re
rounds = [int(m.group(1)) for f in glob.glob("BENCH_r*.json")
          if (m := re.search(r"BENCH_r0*(\d+)\.json", f))]
print((max(rounds) if rounds else 0) + 1)
PYEOF
)
fi
export SPARK_GRAFT_ROUND

run() {
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_ROUND="$SPARK_GRAFT_ROUND" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"metric".*}' \
    | grep -v '"queries_full"' | tail -1
}

echo "bench pair (round $SPARK_GRAFT_ROUND): run 1/2..." >&2
a=$(run)
echo "bench pair (round $SPARK_GRAFT_ROUND): run 2/2..." >&2
b=$(run)

python3 - "$a" "$b" "$SPARK_GRAFT_ROUND" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
rows = {k: round(max(qa[k], qb[k]) / min(qa[k], qb[k]), 3) for k in common}
noisy = {k: {"run1": round(qa[k], 3), "run2": round(qb[k], 3),
             "ratio": rows[k]}
         for k in common if rows[k] > 1.5}
n = int(sys.argv[3])
out = {
    "metric": "bench_pair",
    "total_run1": round(a["value"], 3),
    "total_run2": round(b["value"], 3),
    "n_queries": len(common),
    "n_over_1p5": len(noisy),
    "over_1p5": noisy,
    "max_ratio": max(rows.values()) if rows else None,
    "sf": a.get("sf"),
}
name = f"BENCH_PAIR_r{n:02d}.json"
with open(name, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {name}: totals {out['total_run1']}s / {out['total_run2']}s, "
      f"{out['n_over_1p5']} queries over 1.5x cross-run ratio")
# The pair doubles as the round's settle (bench_settle's min-of-
# consecutive-runs convention at MAX_RUNS=2): record the min-total
# run's full line as the round's BENCH_FULL artifact.
best = sys.argv[1] if a["value"] <= b["value"] else sys.argv[2]
full = f"BENCH_FULL_r{n:02d}.json"
with open(full, "w") as f:
    f.write(best + "\n")
print(f"wrote {full} (min of the pair)")
EOF
