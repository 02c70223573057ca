#!/bin/bash
# r5 battery #7: intermediate pretile aspect (FXTPU_FUSED_RS) A/B.
#
# §8i: the full pretile's 128-lane slab rows DMA at ~266 GB/s vs the
# legacy wide slab's 567, and neither split streams (19.47) nor a
# deeper ring (18.90) recover it — the row-walk rate is per-stream and
# concurrency-immune.  rs=8/16 keep 512/256-lane DMA rows while still
# deleting most of the legacy retile (the n1/rs-way split remains).
# Prize if the wide-row rate holds: legacy compute minus the retile,
# ~32 ps/sample ~ 31 GS/s flagship.  Legacy anchor leg included.
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_rs_battery.jsonl}"
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

run p_rs8    FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_RS=8  -- python bench.py
run p_rs16   FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_RS=16 -- python bench.py
# same-session weather anchor
run l_anchor FXTPU_FUSED_PRETILED=0 -- python bench.py
# rs=8 pure DMA floor for the §8i table
run p_rs8_dmapure FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_RS=8 FXTPU_FUSED_ABLATE=dmapure -- python bench.py

echo "=== r5 rs battery done === $(date -u +%FT%TZ)"
