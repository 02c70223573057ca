#!/bin/bash
# r5 battery #7: the retile-lowering question (design.md §8i follow-up).
#
# 1. scripts/retile_probe.py — isolated cost of the [tile, nbins] ->
#    [tile*n1, n2] lane->sublane retile under three lowerings
#    (production reshape / j1-major tile-permutation stack / per-frame
#    row gather) against a pre-tiled control, slope-timed.
# 2. End-to-end FXTPU_FUSED_RETILE=stack A/B at the two shapes that pay
#    the retile hardest: flagship (the ~7.9 ps/sample wall, §8i) and
#    nchan8 (same n1=32 retile per channel x8).  Legacy legs double as
#    same-session weather anchors (24.7-24.9 / 17.47) AND as the
#    flagship executable-cache re-warm for the driver's end-of-round
#    bench (kernel source lines shifted this session).
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_retile.jsonl}"
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

# isolated lowering probe first (its own text log — one JSON line/leg)
if [ ! -s bench_results/r5_retile_probe.txt ]; then
  echo "=== retile_probe === $(date -u +%H:%M:%S)"
  timeout 2400 python scripts/retile_probe.py \
    > bench_results/r5_retile_probe.txt 2>&1 || true
  tail -6 bench_results/r5_retile_probe.txt
fi

run fl_legacy                              -- python bench.py
run fl_stack    FXTPU_FUSED_RETILE=stack   -- python bench.py
run n8_legacy                              -- python bench.py --config nchan8
run n8_stack    FXTPU_FUSED_RETILE=stack   -- python bench.py --config nchan8
# repeats (drift check; legacy last = driver cache left warm on defaults)
run fl_stack_b  FXTPU_FUSED_RETILE=stack   -- python bench.py
run fl_legacy_b                            -- python bench.py

echo "=== r5 retile battery done === $(date -u +%FT%TZ)"
