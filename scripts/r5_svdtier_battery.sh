#!/bin/bash
# r5 battery #6: precision-tiered SVD conv A/B (FXTPU_SVD_TIER).
#
# The deep-tap conv's cost is rows x passes; the tier drops the tail
# ranks (sigma_k/sigma_1 < 2e-3) to single bf16 dots — row-passes
# 144 -> 112 (f32) and 96 -> 80 (int8) at the production wideband
# window — with the dropped corrections under the 3.1e-5 pipeline
# floor (test_svd_tier_env_knob_lead_and_parity).  This battery
# measures the end-to-end delta at both ingest widths, tier0 legs
# doubling as same-session weather anchors against the late-r4
# wideband numbers (11.73 f32 / 14.47-14.70 int8).
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_svdtier.jsonl}"
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

# tier0 first (the full-pass control = the late-r4 numbers' graph,
# modulo the kernel-source line shift) then tier1, back to back per
# config so the delta rides inside one weather window
run wb_tier0    FXTPU_SVD_TIER=0 -- python bench.py --config wideband
run wb_tier1                     -- python bench.py --config wideband
run wbi8_tier0  FXTPU_SVD_TIER=0 -- python bench.py --config wideband_int8
run wbi8_tier1                   -- python bench.py --config wideband_int8
# repeats (anchor drift check)
run wb_tier0_b  FXTPU_SVD_TIER=0 -- python bench.py --config wideband
run wb_tier1_b                   -- python bench.py --config wideband
run wbi8_tier1_b                 -- python bench.py --config wideband_int8

echo "=== r5 svd-tier battery done === $(date -u +%FT%TZ)"
