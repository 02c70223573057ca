#!/usr/bin/env bash
# Example observation driver (the reference's run.sh analog, minus the
# rtl_biast bias-tee power toggles, which are RTL-SDR-hardware-specific —
# /root/reference/run.sh:1-9).  For live dongles, power the bias tees
# before/after with rtl_biast externally.
set -euo pipefail

# 5-second spectrum observation over the default synthetic source,
# products + plots saved locally.
python -m fxtpu \
    --time 5 \
    --mode spectrum \
    --bandwidth 2.4e6 \
    --frequency 1.4204e9 \
    --num_samp 262144 \
    --resolution 4096 \
    --gain 49.6 \
    --true_delay 2e-6 \
    --no_keyboard \
    --output visibilities_example.csv \
    --save_plot visibilities_example.png \
    -L INFO \
    "$@"   # extra/override flags (argparse last-wins), e.g. --platform cpu

echo "products: visibilities_example.csv / visibilities_example.png"
