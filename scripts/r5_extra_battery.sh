#!/bin/bash
# r5 follow-up legs: configs the r4 battery never measured on hardware
# (nchan8 was added to tpu_battery.sh after the r4 capture) plus
# post-Gauss fresh wideband numbers for the design.md tables.
# Same resumable JSON-log contract as tpu_battery.sh / r5_vpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_vpu_battery.jsonl}"
mkdir -p "$(dirname "$LOG")"
touch "$LOG"

done_already() {
  python - "$LOG" "$1" <<'EOF'
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
EOF
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
    python - "$LOG" "$name" "$line" <<'EOF'
import json, sys, datetime
log, name = sys.argv[1], sys.argv[2]
rec = json.loads(sys.argv[3])
rec = {"run": name,
       "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
           timespec="seconds"), **rec}
with open(log, "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
EOF
  else
    echo "no JSON line (rc=$rc); last output:"
    printf '%s\n' "$out" | tail -4
  fi
}

# never hardware-measured configs
run r5_nchan8        -- python bench.py --config nchan8
# fresh post-Gauss wideband set for the final tables
run r5_wideband      -- python bench.py --config wideband
run r5_wideband_int8 -- python bench.py --config wideband_int8
run r5_wb_localhalo  FXTPU_FUSED_LOCAL_HALO=1 -- python bench.py --config wideband
run r5_wbi8_localhalo FXTPU_FUSED_LOCAL_HALO=1 -- python bench.py --config wideband_int8

echo "=== r5 extra battery done === $(date -u +%FT%TZ)"
