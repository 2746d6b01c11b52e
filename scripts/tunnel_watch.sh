#!/bin/bash
# Detached tunnel watcher: probes the axon TPU every ~10 min; the moment a
# probe succeeds it runs the on-chip battery (scripts/onchip_battery.sh)
# ONCE and exits. Writes state to /tmp/tunnel_watch.log and guards against
# concurrent TPU processes via /tmp/battery_running.
#
#   nohup bash scripts/tunnel_watch.sh > /tmp/tunnel_watch.log 2>&1 &
#   echo $! > /tmp/tunnel_watch.pid
#
# Stop with: kill $(cat /tmp/tunnel_watch.pid)
set -u
cd "$(dirname "$0")/.."
max_probes="${1:-24}"   # ~4 h of coverage by default
for i in $(seq 1 "$max_probes"); do
  echo "[watch] probe $i/$max_probes $(date -u +%H:%M:%S)"
  if timeout 75 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "[watch] TUNNEL UP at $(date -u +%H:%M:%S) — starting battery"
    touch /tmp/battery_running
    bash scripts/onchip_battery.sh
    rm -f /tmp/battery_running
    echo "[watch] battery complete"
    exit 0
  fi
  sleep 540
done
echo "[watch] gave up after $max_probes probes"
exit 1
