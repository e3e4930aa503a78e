#!/bin/bash
cd /root/repo
for args in "--stage bins" "" "--tile 16" "--stage bins --slot searchsorted" "--tile 16 --chunk 256"; do
  timeout 1500 python scripts/devtime.py --n 1000000 --frames 10 $args 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
done
