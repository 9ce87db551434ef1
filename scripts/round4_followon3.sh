#!/bin/bash
# Round-4 follow-on #3: wait for the 50-ep composition chain, then the
# 7-mode structure-build A/B (gates the combined ragged claim build),
# then the full CPU test suite.
cd /root/repo
CHAIN_PID=${1:?usage: round4_followon3.sh <chain_pid>}
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
echo "=== chain exited; combined A/B gate $(date -u +%H:%M:%S)"
timeout 7200 python scripts/forward_build_ab.py \
  > outputs/r4_combined_ab.log 2>&1
tail -24 outputs/r4_combined_ab.log
echo "=== full pytest $(date -u +%H:%M:%S)"
timeout 5400 python -m pytest tests/ -q > outputs/r4_pytest2.log 2>&1
tail -3 outputs/r4_pytest2.log
echo "=== follow-on3 done $(date -u +%H:%M:%S)"
