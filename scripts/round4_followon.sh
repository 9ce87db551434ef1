#!/bin/bash
# Round-4 follow-on, serialized behind the main chain (waits for the chain
# PID to exit): on-chip dedup-build A/B gate, then the full CPU test suite.
# Usage: round4_followon.sh <chain_pid>
cd /root/repo
CHAIN_PID=${1:?usage: round4_followon.sh <chain_pid>}
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
echo "=== chain exited; A/B gate $(date -u +%H:%M:%S)"
timeout 5400 python scripts/forward_build_ab.py \
  > outputs/r4_dedup_ab.log 2>&1
tail -20 outputs/r4_dedup_ab.log
echo "=== full pytest $(date -u +%H:%M:%S)"
timeout 3600 python -m pytest tests/ -q > outputs/r4_pytest.log 2>&1
tail -3 outputs/r4_pytest.log
echo "=== follow-on done $(date -u +%H:%M:%S)"
