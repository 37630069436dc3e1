#!/bin/bash
# Rate-distortion sweep, mirroring the reference's generate_rd.sh
# (generate_rd.sh:1-17): 20 encodes at -f 0.00 .. 0.95 step 0.05,
# collecting "rate distortion size" triples into $3.
# Usage: scripts/generate_rd.sh input.qual scratch.q out.table
set -e
cd "$(dirname "$0")/.."
IN="${1:?usage: generate_rd.sh input.qual scratch.q out.table}"
OUT="${2:?}"
TABLE="${3:?}"
STATS=$(mktemp)
trap 'rm -f "$STATS"' EXIT

idx=0
while [ $idx -lt 20 ]; do
    comp=$(python -c "print(f'{$idx*0.05:.2f}')")
    PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}" python -m qvz_tpu \
        -c 1 -f "$comp" -s --debug-seed "$IN" "$OUT" | tee -a "$STATS"
    idx=$((idx+1))
done
awk '{print $2 $4 $8}' "$STATS" > "$TABLE"
