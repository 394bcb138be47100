"""Assembly throughput at scale: S1 warm re-tag + reassemble on TPU.

Run: N=800 python scripts/bench_assembly.py   (fetch-synced; ONE value
fetch per timed phase — each fetch through the axon tunnel costs ~26 ms,
so per-batch fetches would swamp the actual reassemble time).
"""
import os, time
os.environ.setdefault("PHIFEM_X64", "1")
import jax, jax.numpy as jnp
import numpy as np

import phifem_tpu as pf
from phifem_tpu.models import WeakDirichletPoisson
import sys
sys.path.insert(0, "/root/repo/demo/weak-dirichlet/flower")
from data import levelset, source_term, detection_levelset

n = int(os.environ.get("N", "800"))
grid = pf.Grid(n, n, ((-4.5, -4.5), (4.5, 4.5)), pf.CellType.triangle)
s = WeakDirichletPoisson(grid, mode="bg", detection_degree=1, single_layer_cut=True)
t0 = time.perf_counter()
s.setup(levelset, source_term, detection_levelset=detection_levelset)
_ = np.asarray(s.cell_tags)[:5]
print("cold setup", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
s.assemble()
for b in s.op.batches:
    if getattr(b, "rebuild", None) is not None:
        _ = float(jnp.sum(b.matrices[:1]))
print("cold assemble", time.perf_counter() - t0, flush=True)

def warm_once():
    t0 = time.perf_counter()
    res = pf.compute_tags_measures(grid, detection_levelset, 1, box_mode=True, single_layer_cut=True)
    _ = np.asarray(res.cells_tags.values)[:3]
    t_tag = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.op.reassemble()
    acc = None
    for b in s.op.batches:
        if getattr(b, "rebuild", None) is not None:
            v = jnp.sum(b.matrices[:1])
            acc = v if acc is None else acc + v
    _ = float(acc)  # ONE fetch syncs all rebuilds
    t_re = time.perf_counter() - t0
    return t_tag, t_re

warm_once()
ts = [warm_once() for _ in range(3)]
t_tag = min(t[0] for t in ts); t_re = min(t[1] for t in ts)
nd = s.system.num_dofs
print(f"n={n}: ndofs {nd}  warm tag {t_tag:.4f}s  reassemble {t_re:.4f}s", flush=True)
print(f"assembly MDoF/s (tag+reassemble): {nd/(t_tag+t_re)/1e6:.1f}", flush=True)
print(f"reassemble-only MDoF/s: {nd/t_re/1e6:.1f}", flush=True)
