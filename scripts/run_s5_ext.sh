#!/bin/sh
# Extended S5 param1 study: levels 5-6 (465k / 1.86M DoF) on CPU float64 —
# errors are platform-independent; CPU avoids remote-compile variance.
# One level per process (a failure loses one level).  Appends to
# docs/s5_param1_ext.csv.
cd "$(dirname "$0")/.." || exit 1
OUT=docs/s5_param1_ext.csv
for L in 5 6; do
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/run_s5_level.py "$L" --out "$OUT" --tol 1e-10 \
    >> /tmp/s5_ext.log 2>&1
  echo "level $L rc=$?" >> /tmp/s5_ext.log
done
