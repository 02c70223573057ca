#!/bin/bash
# r5 battery #5: final headline capture at ROUND-5 DEFAULTS.
#
# Run after the pretiled default lands (design.md §8i): every config at
# stock settings, same session, including the first hardware number for
# the 8-input/36-baseline Gram-matmul config (nchan8 — added to
# tpu_battery.sh after the r4 capture, so it has never been measured).
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_headline.jsonl}"
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

run flagship       -- python bench.py
run flagship_int8  -- python bench.py --config default_int8
run wideband       -- python bench.py --config wideband
run wideband_int8  -- python bench.py --config wideband_int8
run nchan8         -- python bench.py --config nchan8

echo "=== r5 headline battery done === $(date -u +%FT%TZ)"
