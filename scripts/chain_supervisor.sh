#!/bin/bash
# Keep the round-3 wait-then-chain alive until a deadline (UTC ISO, $1).
# The waiter (tpu_wait_then_chain.sh) gives up after 120 probe attempts
# (~12 h of tunnel downtime); this supervisor relaunches it so a late TPU
# recovery still runs the measurement chain. Exits on its own once the
# chain actually started (the waiter logs "tpu up after attempt N").
DEADLINE=${1:-"2026-08-18T20:00:00"}
cd /root/repo || exit 1
while [ "$(date -u +%s)" -lt "$(date -u -d "$DEADLINE" +%s)" ]; do
  pid=$(cat /tmp/chain_r3b.pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    sleep 120
    continue
  fi
  if grep -q "tpu up after attempt" /tmp/chain_r3b.log 2>/dev/null; then
    echo "supervisor: chain already ran; exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
  echo "supervisor: relaunching waiter $(date -u +%H:%M:%S)"
  nohup bash scripts/tpu_wait_then_chain.sh >> /tmp/chain_r3b.log 2>&1 &
  echo $! > /tmp/chain_r3b.pid
  sleep 300
done
echo "supervisor: deadline reached $(date -u +%H:%M:%S)"
