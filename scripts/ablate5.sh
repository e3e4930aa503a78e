#!/bin/bash
cd /root/repo
timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --nocull --dup 4 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --nocull --dup 3 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
