#!/bin/bash
# Curation-chain core-scaling measurement: 8 -> 32 cores at 2M synthetic
# docs, interleaved rounds (one 8-core + one 32-core run per round) so a
# box-noise window hits both legs, best-of-N reported. Secondary artifact
# only -- the north-rule N->4N gate is the extraction measurement
# (BASELINE.md protocol); this completes the chain's scaling record.
#
# Usage: tools/bench_curation_scaling.sh [rounds=3] [out=tools/bench_curation_scaling.json]
set -u
ROUNDS=${1:-3}
OUT=${2:-tools/bench_curation_scaling.json}
JAR=target/scala-2.13/ocrenhancedprojecspark_2.13-0.1.0.jar
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens=java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens=java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

LEGLOG=${OUT%.json}_legs.jsonl
: > "$LEGLOG"

run_leg() { # cores tag
  local cores=$1 tag=$2
  local dir; dir=$(mktemp -d /tmp/graft-curscale-XXXX)
  local json
  json=$(java $OPENS -Xms8g -Xmx8g -XX:+AlwaysPreTouch \
    -Dspark.master=local[$cores] \
    -Dspark.ui.enabled=false -cp "/opt/spark/jars/*:$JAR" \
    graft.RunCuration --input synth:2000000 --output "$dir" \
    --run-id "$tag" 2>/dev/null | grep '^{' | tail -1)
  rm -rf "$dir"
  echo "$json" >> "$LEGLOG"
  # per-stage "sec" fields precede the job-total "sec" (last on the line)
  echo "$json" | grep -o '"sec":[0-9.]*' | cut -d: -f2 | tail -1
}

declare -a T8 T32
for r in $(seq 1 "$ROUNDS"); do
  t8=$(run_leg 8 "s8-r$r");   echo "round $r: 8-core  ${t8}s" >&2
  t32=$(run_leg 32 "s32-r$r"); echo "round $r: 32-core ${t32}s" >&2
  T8+=("$t8"); T32+=("$t32")
done

python3 - "$OUT" "${T8[@]}" -- "${T32[@]}" <<'PY'
import json, statistics, sys
out = sys.argv[1]
sep = sys.argv.index('--')
t8 = [float(x) for x in sys.argv[2:sep]]
t32 = [float(x) for x in sys.argv[sep+1:]]
m8, m32 = min(t8), min(t32)
md8, md32 = statistics.median(t8), statistics.median(t32)
rec = {
    "job": "curation-chain synth:2000000",
    "legs": {"8": t8, "32": t32},
    "min": {"8": m8, "32": m32, "speedup": m8 / m32, "efficiency": m8 / m32 / 4},
    "median": {"8": md8, "32": md32, "speedup": md8 / md32, "efficiency": md8 / md32 / 4},
    "docs_per_sec_32core_min": 2_000_000 / m32,
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec, indent=1))
PY
