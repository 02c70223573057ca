#!/bin/bash
# r5 battery #4: PRETILED ablation ladder (design.md §8i).
#
# The pretiled slab layout deletes the legacy [tile, nbins] ->
# [tile, n1, n2] retile (the measured ~3.3 ps VPU wall) yet its first
# hardware base leg came in 21% BELOW the legacy flagship.  This
# ladder repeats the §8h stage-truncation decomposition UNDER the
# pretiled layout so the regressed stage is localized by diffing the
# two ladders (legacy ladder: scripts/r5_ab_battery.sh l_abl_*).
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_pretiled_ablate.jsonl}"
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

# pretiled stage-truncation ladder (FXTPU_FUSED_PRETILED default ON)
run p_abl_dmapure FXTPU_FUSED_ABLATE=dmapure -- python bench.py
run p_abl_firflat FXTPU_FUSED_ABLATE=firflat -- python bench.py
run p_abl_fir     FXTPU_FUSED_ABLATE=fir     -- python bench.py
run p_abl_fft1    FXTPU_FUSED_ABLATE=fft1    -- python bench.py
run p_abl_nox     FXTPU_FUSED_ABLATE=nox     -- python bench.py
# weather anchor: repeat the full pretiled step inside this session
run p_base4                                  -- python bench.py

echo "=== r5 pretiled ablate battery done === $(date -u +%FT%TZ)"
