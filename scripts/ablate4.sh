#!/bin/bash
cd /root/repo
for args in "--dup 4" "--tile 16 --dup 4" "--dup 3" "--tile 16 --dup 4 --chunk 256" "--tile 16 --dup 4 --scale 0.01,0.08"; do
  timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --nocull $args 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
done
