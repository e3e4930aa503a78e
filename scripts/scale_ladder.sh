#!/bin/bash
# Per-stage decomposition of the scale ladder's top rows (VERDICT r4 #3
# and #8): which K-stage grows 2.9x for 2x pairs between 3M and 6M, and
# where the 1440p point's 45.1 ms goes.  All runs in one shell session
# so the same-day tunnel-variance rule holds (CLAUDE.md).
#
# Usage: bash scripts/scale_ladder.sh [stage-list]
set -u
cd "$(dirname "$0")/.."
STAGES="${1:-project bins_sort bins_gather bins raster full}"
for N in 3000000 6000000; do
  for S in $STAGES; do
    python scripts/devtime.py --n $N --dup 2.2 --stage "$S" --frames 10
  done
done
# 1440p @ 1M (round-4 ladder row: 45.1 ms at dup 2.7)
for S in $STAGES; do
  python scripts/devtime.py --n 1000000 --h 1440 --w 2560 --dup 2.7 \
    --stage "$S" --frames 10
done
# tile-size re-probe at 1440p: is tile 32 still optimal there?
python scripts/devtime.py --n 1000000 --h 1440 --w 2560 --dup 2.7 \
  --tile 16 --frames 10
python scripts/devtime.py --n 1000000 --h 1440 --w 2560 --dup 2.7 \
  --tile 64 --frames 10
