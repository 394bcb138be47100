import os, sys, time
os.environ.setdefault("PHIFEM_X64", "1")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import phifem_tpu as pf
from phifem_tpu import tagging
sys.path.insert(0, "/root/repo/demo/weak-dirichlet/flower")
from data import detection_levelset

n = 200
grid = pf.Grid(n, n, ((-4.5, -4.5), (4.5, 4.5)), pf.CellType.triangle)

def t(label, fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    return out

res = t("compute_tags_measures warm", lambda: pf.compute_tags_measures(
    grid, detection_levelset, 1, box_mode=True, single_layer_cut=True))

out = t("_tags_jit dispatch only", lambda: tagging._tags_jit(
    grid, 1, True, detection_levelset, None, None))
t("_tags_jit + device_get", lambda: jax.device_get(tagging._tags_jit(
    grid, 1, True, detection_levelset, None, None)))

cells, facets, ndeg = jax.device_get(tagging._tags_jit(grid, 1, True, detection_levelset, None, None))
ct, ft = cells, facets
t("one_sided_facets 100+101", lambda: (
    tagging.one_sided_facets(grid, np.where(ft == 4)[0], ct, (1, 2)),
    tagging.one_sided_facets(grid, np.where(ft == 3)[0], ct, (2, 3))))
