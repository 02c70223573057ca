#!/bin/bash
# r5 flagship VPU-block decomposition + compute-cut levers.
#
# The late-r4 dmax2 verdict (design.md §8h) showed the flagship step is
# COMPUTE-bound (input DMA overlaps; doubling it left 24.9 GS/s flat),
# so the remaining wall is the ~40 ps/sample compute chain.  This
# battery decomposes the VPU block (FIR / retile / sums / X) with the
# fixed `firflat` + `nosum` ablate stages, and A/Bs the two candidate
# compute cuts:
#   - FXTPU_FUSED_BANDED=1: shallow FIR via the banded MXU matmul
#     instead of the VPU tap loop
#   - FXTPU_FUSED_LOCAL_HALO=1: tail-carry DMA (lowers the hidden DMA
#     floor — matters only for the ceiling once compute drops below it)
#
# Same resumable contract as tpu_battery.sh: one JSON line per finished
# run in the log; re-running skips names already logged with value > 0.
#
# Usage: scripts/r5_vpu_battery.sh [results.jsonl] [poll_hours]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_vpu_battery.jsonl}"
POLL_HOURS="${2:-10}"
mkdir -p "$(dirname "$LOG")"
touch "$LOG"

echo "r5 battery start $(date -u +%FT%TZ) log=$LOG"

polls=$((POLL_HOURS * 3600 / 60))
up=""
for i in $(seq 1 "$polls"); do
  plat=$(timeout 90 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null)
  if [ -n "$plat" ] && [ "$plat" != "cpu" ]; then
    echo "backend '$plat' up at $(date -u +%FT%TZ) (poll $i)"
    up=1
    break
  fi
  sleep 50
done
if [ -z "$up" ]; then
  echo "backend never came up within ${POLL_HOURS}h; giving up at $(date -u +%FT%TZ)"
  exit 1
fi

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

run() {  # run <name> [ENV=VAL ...] -- <cmd ...>
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

# ---- same-day baseline + full truncation ladder (flagship) -------------
run r5_base                                 -- python bench.py
run r5_abl_dmapure FXTPU_FUSED_ABLATE=dmapure -- python bench.py
run r5_abl_firflat FXTPU_FUSED_ABLATE=firflat -- python bench.py
run r5_abl_fir     FXTPU_FUSED_ABLATE=fir     -- python bench.py
run r5_abl_fft1    FXTPU_FUSED_ABLATE=fft1    -- python bench.py
run r5_abl_nosum   FXTPU_FUSED_ABLATE=nosum   -- python bench.py
run r5_abl_nox     FXTPU_FUSED_ABLATE=nox     -- python bench.py

# ---- compute-cut levers -------------------------------------------------
run r5_banded      FXTPU_FUSED_BANDED=1     -- python bench.py
run r5_localhalo   FXTPU_FUSED_LOCAL_HALO=1 -- python bench.py
run r5_banded_localhalo FXTPU_FUSED_BANDED=1 FXTPU_FUSED_LOCAL_HALO=1 -- python bench.py

# ---- int8 flagship sanity on the same levers ---------------------------
run r5_int8_base   -- python bench.py --config default_int8
run r5_int8_banded FXTPU_FUSED_BANDED=1 -- python bench.py --config default_int8

echo "=== r5 battery done === $(date -u +%FT%TZ)"
