#!/bin/bash
# One-shot hardware measurement battery (dev tooling).
#
# Run when the TPU comes back after an outage: executes the pending
# in-situ A/Bs and the standard profiles in dependency order, teeing
# everything under /tmp/hw_session/. Each step is individually
# timeout-bounded so a relay hang can't wedge the whole battery.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_session
mkdir -p "$OUT"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" 2>&1 | tee "$OUT/$name.txt"
  echo "=== $name done rc=$? ==="
}

# 0. liveness (fast fail if the relay is still hung)
run probe 120 python -c "
import jax, jax.numpy as jnp
print(jax.devices(), float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))
print('TPU OK')" || exit 1
grep -q "TPU OK" "$OUT/probe.txt" || { echo "TPU still down"; exit 1; }

# 1. warp window A/B (half vs narrow vs wide) -- decides dispatch order
run warp_insitu 3600 python scripts/profile_warp_insitu.py

# 2. d2s emission A/B (reshape vs dirac conv) -- decides d2s routing
run d2s_insitu 3600 python scripts/profile_d2s_insitu.py

# 3. standalone warp kernel breakdown (feeds the ROOFLINE stage row)
run warp_breakdown 1800 python scripts/profile_warp.py

# 4. headline bench (records the post-A/B numbers)
run bench 3600 python bench.py

# 5. traces: b1 + b8 + train step (self-time de-nested, churn aggregate)
run trace_b1 1800 python scripts/profile_trace.py --batch 1
run trace_b8 1800 python scripts/profile_trace.py --batch 8
run trace_train 2400 python scripts/profile_trace.py --batch 8 --train

echo "all done; outputs in $OUT"
