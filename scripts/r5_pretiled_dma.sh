#!/bin/bash
# r5 battery #6: pretiled DMA-wall knob sweep (design.md §8i).
#
# The pretiled ladder localized the layout regression to the INPUT DMA
# itself: dmapure measures 45.5 ps/sample (~266 GB/s) under the
# [R*n1, n2=128] slab vs 21.6 ps (567 GB/s) under the legacy
# [R, nbins] slab — same HBM bytes, narrow-lane destination, and the
# step time (~51 ps) shows the slow copy isn't overlapping compute
# either.  These legs test whether DMA *concurrency* (per-plane/channel
# split streams, deeper slab ring) or *fewer bytes* (local-halo carry
# deletes the pad-row re-read, 2/3 the bytes at tile=2*pad) recover the
# rate without giving up the retile deletion.
# Same resumable JSON-log contract as tpu_battery.sh.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/r5_pretiled_dma.jsonl}"
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

# fewer DMA bytes: the biggest lever if the narrow copy is rate-walled
run p_localhalo   FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_LOCAL_HALO=1 -- python bench.py
# more DMA concurrency
run p_splitdma    FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_SPLITDMA=1 -- python bench.py
run p_nbuf3       FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_NBUF=3 -- python bench.py
# combos (only worth compiling if the singles move the needle, but the
# battery is resumable — comment-free serial order keeps it simple)
run p_lh_split    FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_LOCAL_HALO=1 FXTPU_FUSED_SPLITDMA=1 -- python bench.py
run p_lh_nbuf3    FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_LOCAL_HALO=1 FXTPU_FUSED_NBUF=3 -- python bench.py
# pure-DMA floors under the winning byte-count knob, for the §8i table
run p_lh_dmapure  FXTPU_FUSED_PRETILED=1 FXTPU_FUSED_LOCAL_HALO=1 FXTPU_FUSED_ABLATE=dmapure -- python bench.py

echo "=== r5 pretiled DMA battery done === $(date -u +%FT%TZ)"
