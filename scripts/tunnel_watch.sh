#!/bin/bash
# Tunnel watcher: ping jax.devices() under timeout from a FRESH process each
# try (a failed backend init is cached in-process); when the ping succeeds,
# run the queued job (argv) and exit with its status.
LOG=${WATCH_LOG:-/root/repo/logs/probes/tunnel_watch.log}
while true; do
  if timeout 300 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP — launching: $*" | tee -a "$LOG"
    exec "$@"
  fi
  echo "$(date -u +%FT%TZ) tunnel still down" >> "$LOG"
  sleep 120
done
