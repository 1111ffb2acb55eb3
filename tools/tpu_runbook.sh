#!/bin/bash
# One-shot TPU measurement sequence (run when the chip/tunnel is healthy).
# Each stage appends to /tmp/runbook/<stage>.log; a stage failure does not
# stop later stages.  Takes the axon grant for the whole run (~45-60 min).
#
#   bash tools/tpu_runbook.sh [--skip-smoke]
#
# Order: hardware parity first (smoke), then the headline bench, then the
# tuning sweeps / stage attribution / scale+stream benches.

set -u
mkdir -p /tmp/runbook
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "=== $name: $* (timeout ${tmo}s)"
  ( timeout "$tmo" "$@" > "/tmp/runbook/$name.log" 2>&1;
    echo "EXIT=$?" >> "/tmp/runbook/$name.log" )
  tail -3 "/tmp/runbook/$name.log"
}

if [[ "${1:-}" != "--skip-smoke" ]]; then
  run smoke    1800 python tools/tpu_smoke.py
fi
run bench      900 python bench.py
run tune      2400 python tools/tune_kernels.py --quick
run stages    1200 python tools/bench_stages.py
run roofline  1500 python tools/bench_roofline.py
run scale     1500 python tools/bench_scale.py
run stream     900 python tools/bench_stream.py --tpu
# note --out: the quick paired refresh must NOT overwrite the curated
# docs/sensitivity_vs_reference.json (SF7/8/10/12 x 32 packets + soft
# curve); regenerate that one deliberately with
#   python tools/bench_sensitivity.py --sf 7 8 10 12 --packets 32 --soft
run sens      1800 python tools/bench_sensitivity.py --packets 24 \
                   --out /tmp/runbook/sensitivity_refresh.json
# LAST on purpose: a positive crash reproduction can hard-fault the TPU
# worker and poison the tunnel for anything after it
run crash     1200 python tools/tune_kernels.py --crash-retest
echo "=== runbook done; logs in /tmp/runbook/"
