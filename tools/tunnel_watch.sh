#!/bin/bash
# Watch for the axon relay to come back, then run the chip runbook
# unattended (CLAUDE.md "Chip runbook"). The relay died mid-round-3 and is
# unrecoverable from inside the VM — but the host side may restore it, and
# every measurement in the runbook queue is blocked on it.
#
#   bash tools/tunnel_watch.sh &   # poll 60 s; on open: stamp + runbook
#
# Before launching the runbook it waits until no pytest/bench process is
# running: this box has ONE CPU core and host-side contention inflates
# recorded TPU timings (BASELINE.md anchor-8 caveat).
set -u
cd "$(dirname "$0")/.."
STAMP=${TUNNEL_STAMP:-/tmp/tunnel_open.stamp}

probe() {
    python3 - <<'EOF' >/dev/null 2>&1
import socket
s = socket.socket(); s.settimeout(5)
s.connect(("127.0.0.1", 8082))
EOF
}

while true; do
    if probe; then
        date -u +"tunnel OPEN at %Y-%m-%dT%H:%M:%SZ" | tee "$STAMP"
        # wait for CPU quiet (check only — never kill by pattern)
        while ps aux | grep -E "[p]ytest|python [b]ench|[c]ore_exp_runner" \
                >/dev/null; do
            sleep 60
        done
        exec bash tools/chip_runbook.sh
    fi
    sleep 60
done
