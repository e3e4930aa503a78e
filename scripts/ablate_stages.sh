#!/bin/bash
cd /root/repo
for s in bins_order bins_counts bins_slots bins_tiles bins_sort bins_edges; do
  timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --stage $s 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
done
