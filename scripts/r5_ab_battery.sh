#!/bin/bash
# r5 battery #3: SAME-SESSION legacy-vs-pretiled A/B (design.md §8i).
#
# The pretiled battery's p_base leg measured 19.6 GS/s vs the r4
# flagship's 24.9 — but cross-day numbers ride the tunnel's weather.
# This battery interleaves legacy (FXTPU_FUSED_PRETILED=0) and pretiled
# repeats back to back so the layout delta is measured inside one
# session, plus the legacy dmapure/firflat stages to localize any DMA
# rate change from the narrow-lane [R*n1, n2] slab shape.
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_ab_battery.jsonl}"
mkdir -p "$(dirname "$LOG")"
touch "$LOG"

done_already() {
  python - "$LOG" "$1" <<'PYEOF'
import json, sys
log, name = sys.argv[1], sys.argv[2]
for line in open(log):
    try:
        r = json.loads(line)
    except ValueError:
        continue
    if r.get("run") == name and r.get("value", 0) > 0:
        sys.exit(0)
sys.exit(1)
PYEOF
}

run() {
  name="$1"; shift
  envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if done_already "$name"; then
    echo "=== $name === already logged, skipping"
    return 0
  fi
  echo "=== $name === $(date -u +%H:%M:%S) ${envs[*]:-}"
  out=$(timeout 2400 env "${envs[@]}" "$@" 2>&1)
  rc=$?
  line=$(printf '%s\n' "$out" | grep '^{' | tail -1)
  if [ -n "$line" ]; then
    python - "$LOG" "$name" "$line" <<'PYEOF'
import json, sys, datetime
log, name = sys.argv[1], sys.argv[2]
rec = json.loads(sys.argv[3])
rec = {"run": name,
       "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
           timespec="seconds"), **rec}
with open(log, "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
PYEOF
  else
    echo "no JSON line (rc=$rc); last output:"
    printf '%s\n' "$out" | tail -4
  fi
}

# back-to-back layout A/B (legacy first: its executable is the r4 one,
# so this leg doubles as the weather calibration against 24.9)
run l_base       FXTPU_FUSED_PRETILED=0 -- python bench.py
run p_base2                             -- python bench.py
run l_localhalo  FXTPU_FUSED_PRETILED=0 FXTPU_FUSED_LOCAL_HALO=1 -- python bench.py
run l_abl_dmapure FXTPU_FUSED_PRETILED=0 FXTPU_FUSED_ABLATE=dmapure -- python bench.py
run l_abl_firflat FXTPU_FUSED_PRETILED=0 FXTPU_FUSED_ABLATE=firflat -- python bench.py
run l_abl_fir     FXTPU_FUSED_PRETILED=0 FXTPU_FUSED_ABLATE=fir     -- python bench.py
run l_base2      FXTPU_FUSED_PRETILED=0 -- python bench.py
run p_base3                             -- python bench.py

echo "=== r5 A/B battery done === $(date -u +%FT%TZ)"
