#!/bin/bash
# r5 battery #8: nchan8 attribution + wideband re-anchor.
#
# First hardware nchan8 number (r5_headline.jsonl): 17.23 GS/s, MFU
# 0.336.  These legs attribute it with the same stage-truncation tool
# as the flagship/wideband studies (§8g/§8i): dmapure isolates the
# 8-channel slab DMA (4x flagship bytes/tile), nox isolates the
# 36-baseline per-pair X products (full - nox), fir adds the tap loop
# + retile.  The wideband leg re-anchors the 10.76-vs-11.73 spread
# seen between the r5 headline and late-r4 captures (same code).
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_nchan8_ablate.jsonl}"
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

run n8_dmapure FXTPU_FUSED_ABLATE=dmapure -- python bench.py --config nchan8
run n8_fir     FXTPU_FUSED_ABLATE=fir     -- python bench.py --config nchan8
run n8_nox     FXTPU_FUSED_ABLATE=nox     -- python bench.py --config nchan8
run wb_anchor  -- python bench.py --config wideband

echo "=== r5 nchan8 ablate battery done === $(date -u +%FT%TZ)"
