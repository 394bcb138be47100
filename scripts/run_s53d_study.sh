#!/bin/sh
# S5-3D convergence study (VERDICT round-3 item 7): 3 levels, contrast
# 1000 + contrast-1 control, preconditioned fgmres.  One process per
# level (a wedge loses one level).  CPU: env -u PALLAS_AXON_POOL_IPS
# JAX_PLATFORMS=cpu sh scripts/run_s53d_study.sh
set -x
for lvl in 0 1 2; do
  python scripts/run_s53d_level.py "$lvl" --precond --contrast 1000 \
    --out docs/s53d_results.csv
done
for lvl in 0 1 2; do
  python scripts/run_s53d_level.py "$lvl" --precond --contrast 1 \
    --out docs/s53d_results.csv
done
