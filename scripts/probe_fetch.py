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

def t(label, fn, reps=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps): fn()
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)

out = tagging._tags_jit(grid, 1, True, detection_levelset, None, None)
cells, facets, ndeg = out
t("device_get tuple(3)", lambda: jax.device_get(tagging._tags_jit(grid, 1, True, detection_levelset, None, None)))
t("device_get cells only", lambda: jax.device_get(tagging._tags_jit(grid, 1, True, detection_levelset, None, None)[0]))

@jax.jit
def packed(grid_args=None):
    c, f, nd = tagging._tags_jit(grid, 1, True, detection_levelset, None, None)
    ndb = jnp.asarray([nd % 256, (nd // 256) % 256, nd // 65536], jnp.int32).astype(jnp.int8)
    return jnp.concatenate([c, f, ndb])
t("device_get packed int8", lambda: jax.device_get(packed()))
