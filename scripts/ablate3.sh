#!/bin/bash
cd /root/repo
for args in "--stage bins" "" "--dup 4" "--tile 16 --dup 4" "--stage bins_slots" "--stage bins_tiles" "--stage bins_sort"; do
  timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 $args 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
done
