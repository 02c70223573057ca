#!/bin/bash
# TPU bench battery — the durable, committed form of the round-2/3 /tmp
# drivers (VERDICT r3 missing #4).  Waits for the remote-TPU tunnel, then
# serially runs the full lever matrix (one chip — strictly serial; each
# run is its own subprocess because jit caches are per-process while the
# persistent XLA disk cache makes recompiles cheap).
#
# Idempotent + resumable: every completed run appends ONE json line
#   {"run": <name>, "ts": <iso>, ...bench json...}
# to the results log (arg 1, default bench_results/tpu_battery.jsonl).
# Re-running the script skips any name already logged with value > 0, so
# a tunnel flap mid-battery costs only the in-flight run.
#
# Probes (dma_overlap/tpu_breakdown/dma_shape) are free-text, not JSON —
# their stdout goes to <log>.probes.txt, gated by a done-marker line.
#
# Usage: scripts/tpu_battery.sh [results.jsonl] [poll_hours]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-bench_results/tpu_battery.jsonl}"
POLL_HOURS="${2:-10}"
mkdir -p "$(dirname "$LOG")"
touch "$LOG"
PROBELOG="${LOG%.jsonl}.probes.txt"

echo "battery start $(date -u +%FT%TZ) log=$LOG"

# ---- wait for a non-CPU backend (a down tunnel HANGS probes) ----------
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

# ---- helpers ----------------------------------------------------------
done_already() {  # done_already <name> -> 0 if logged with value > 0
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
    # the heredoc occupies stdin, so the record rides argv
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

probe() {  # probe <name> <script> — free-text output, done-marker gated
  name="$1"; script="$2"
  if grep -q "^=== probe $name done ===" "$PROBELOG" 2>/dev/null; then
    echo "=== probe $name === already logged, skipping"
    return 0
  fi
  echo "=== probe $name === $(date -u +%H:%M:%S)"
  {
    echo "=== probe $name start $(date -u +%FT%TZ) ==="
    timeout 2400 python "$script" 2>&1 && echo "=== probe $name done ==="
  } >> "$PROBELOG"
  tail -12 "$PROBELOG"
}

# ---- headline configs (merged-rows fused layout is the default) --------
run flagship                  -- python bench.py
run flagship_int8             -- python bench.py --config default_int8
run wideband                  -- python bench.py --config wideband
run wideband_int8             -- python bench.py --config wideband_int8
run nchan8                    -- python bench.py --config nchan8

# ---- static-slot A/B (design.md §8d) -----------------------------------
run flagship_static      FXTPU_FUSED_STATIC_SLOT=1 -- python bench.py
run wideband_int8_static FXTPU_FUSED_STATIC_SLOT=1 -- python bench.py --config wideband_int8

# ---- precision A/B: 1-pass bf16 vs 3-pass split (§8e) -------------------
run flagship_1pass       FXTPU_FFT_PRECISION=default -- python bench.py
run wideband_1pass       FXTPU_FFT_PRECISION=default -- python bench.py --config wideband
run wideband_int8_1pass  FXTPU_FFT_PRECISION=default -- python bench.py --config wideband_int8

# ---- NBUF sweep on the DMA-heaviest config ------------------------------
run wideband_int8_nbuf3 FXTPU_FUSED_NBUF=3 -- python bench.py --config wideband_int8
run wideband_int8_nbuf4 FXTPU_FUSED_NBUF=4 -- python bench.py --config wideband_int8

# ---- SVD rank tiering at wideband f32 (§8f; 1e-5/rank-6 is the DEFAULT
# ---- since r4 — the A/B legs are the strict tier and the margin-eroding
# ---- looser one) --------------------------------------------------------
run wideband_svdtol_1e7 FXTPU_SVD_TOL=1e-7 -- python bench.py --config wideband
run wideband_svdtol_3e5 FXTPU_SVD_TOL=3e-5 -- python bench.py --config wideband
# max-speed wideband f32: 1-pass on top of the rank-6 default
run wideband_fast FXTPU_FFT_PRECISION=default -- python bench.py --config wideband

# ---- stage-truncation attribution (FXTPU_FUSED_ABLATE; bench is pure
# ---- timing so truncated outputs are fine) — the MFU table (§8 next #2).
# ---- dmapure = TRUE DMA floor (everything downstream skipped); the plain
# ---- 'dma' stage still runs the accumulate/X machinery on raw planes;
# ---- nox = full pipeline minus the X-stage products ('full - nox' = X).
run flag_abl_dmapure FXTPU_FUSED_ABLATE=dmapure -- python bench.py
run flag_abl_dmanox FXTPU_FUSED_ABLATE=dma,nox -- python bench.py
run flag_abl_dma   FXTPU_FUSED_ABLATE=dma  -- python bench.py
run flag_abl_fir   FXTPU_FUSED_ABLATE=fir  -- python bench.py
run flag_abl_fft1  FXTPU_FUSED_ABLATE=fft1 -- python bench.py
run flag_abl_nox   FXTPU_FUSED_ABLATE=nox  -- python bench.py
run wb_abl_dmapure FXTPU_FUSED_ABLATE=dmapure -- python bench.py --config wideband
run wb_abl_dma     FXTPU_FUSED_ABLATE=dma  -- python bench.py --config wideband
run wb_abl_fir     FXTPU_FUSED_ABLATE=fir  -- python bench.py --config wideband
run wb_abl_fft1    FXTPU_FUSED_ABLATE=fft1 -- python bench.py --config wideband
run wb_abl_nox     FXTPU_FUSED_ABLATE=nox  -- python bench.py --config wideband
run wbi8_abl_dmapure FXTPU_FUSED_ABLATE=dmapure -- python bench.py --config wideband_int8
run wbi8_abl_dma0  FXTPU_FUSED_ABLATE=dma0 -- python bench.py --config wideband_int8
run wbi8_abl_dma   FXTPU_FUSED_ABLATE=dma  -- python bench.py --config wideband_int8
run wbi8_abl_fir   FXTPU_FUSED_ABLATE=fir  -- python bench.py --config wideband_int8
run wbi8_abl_fft1  FXTPU_FUSED_ABLATE=fft1 -- python bench.py --config wideband_int8
run wbi8_abl_nox   FXTPU_FUSED_ABLATE=nox  -- python bench.py --config wideband_int8

# ---- free-text attribution probes --------------------------------------
probe dma_overlap scripts/dma_overlap_probe.py
probe breakdown   scripts/tpu_breakdown.py
probe dma_shape   scripts/dma_shape_probe.py

echo "=== battery done === $(date -u +%FT%TZ)"
