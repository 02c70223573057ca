#!/bin/bash
# r5 battery #2: the PRETILED slab layout (design.md §8i) on hardware.
#
# The r5 ladder on the pre-pretiled kernel (bench_results/
# r5_vpu_battery.jsonl) measured firflat == dmapure (47.1 vs 47.2 GS/s):
# the FIR tap loop hides under the DMA wait, so the flagship VPU wall is
# the [tile, nbins] -> [tile, n1, n2] lane->sublane retile and the
# machinery downstream of it.  The pretiled layout deletes that retile.
# This battery re-runs the full ladder + levers on the new kernel:
#   - base + truncation ladder (attribution table for design.md)
#   - local-halo (DMA floor cut — matters once compute approaches it)
#   - banded (FIR via MXU — mutually exclusive with pretiled since it
#     forces the SVD routing; the A/B picks the flagship default)
#   - int8 flagship (NOT pretiled — packed-word lanes don't reinterpret;
#     sanity that it didn't regress)
#   - nchan8 + wideband legs (final-table numbers, never/stale on hw)
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_pretiled_battery.jsonl}"
POLL_HOURS="${2:-10}"
mkdir -p "$(dirname "$LOG")"
touch "$LOG"

echo "r5 pretiled battery start $(date -u +%FT%TZ) log=$LOG"

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

# ---- pretiled flagship: base + levers ----------------------------------
run p_base                                  -- python bench.py
run p_localhalo  FXTPU_FUSED_LOCAL_HALO=1   -- python bench.py
run p_banded     FXTPU_FUSED_BANDED=1       -- python bench.py
run p_int8                                  -- python bench.py --config default_int8

# ---- truncation ladder on the pretiled kernel --------------------------
run p_abl_dmapure FXTPU_FUSED_ABLATE=dmapure -- python bench.py
run p_abl_firflat FXTPU_FUSED_ABLATE=firflat -- python bench.py
run p_abl_fir     FXTPU_FUSED_ABLATE=fir     -- python bench.py
run p_abl_fft1    FXTPU_FUSED_ABLATE=fft1    -- python bench.py
run p_abl_nosum   FXTPU_FUSED_ABLATE=nosum   -- python bench.py
run p_abl_nox     FXTPU_FUSED_ABLATE=nox     -- python bench.py

# ---- never/stale hardware numbers for the final tables -----------------
run p_nchan8         -- python bench.py --config nchan8
run p_wideband       -- python bench.py --config wideband
run p_wideband_int8  -- python bench.py --config wideband_int8
run p_1pass FXTPU_FFT_PRECISION=default -- python bench.py

echo "=== r5 pretiled battery done === $(date -u +%FT%TZ)"
