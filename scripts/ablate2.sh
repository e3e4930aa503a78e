#!/bin/bash
cd /root/repo
timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --stage bins_tiles 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --stage bins_tiles --nocull 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --stage bins 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --nocull 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
timeout 1200 python scripts/devtime.py --n 1000000 --frames 10 --tile 16 2>&1 | grep -vE "^WARNING|^\[2m" | tail -1
