"""Reconstruction of dolfinx's serial import-time entity numbering.

dolfinx's ``XDMFFile.read_mesh`` does not keep the file's cell order: mesh
creation reorders cells locally with the Gibbs-Poole-Stockmeyer algorithm
on the cell dual graph (``dolfinx::graph::reorder_gps``), renumbers
vertices, and numbers facets by sorted-vertex-tuple lexicographic order.
The reference's golden tag CSVs for the imported ``disk.xdmf`` are in that
internal numbering, so per-entity index-exact parity (what the reference's
own test asserts, ``tests/test_compute_meshtags.py:239-243``) requires
reproducing it.

This module reimplements the pipeline from the GPS paper (Gibbs, Poole,
Stockmeyer 1976) with the tie-breaking details fixed empirically against
two independent oracles:

* FIXED POINT: the three dolfinx-WRITTEN structured meshes
  (``coarse_square``/``square_tri``/``square_quad`` h5 files are in
  dolfinx's own order) must reorder to the identity — and do, exactly;
* the 24 golden disk configurations (2 levelsets x degrees 1-3 x
  discretize x single_layer_cut) must match per-cell AND per-facet
  index-exactly — and do, for cells and facets both (48 golden files).

The load-bearing tie-break: the dual-graph adjacency lists must be in
dolfinx's ``build_dual_graph`` order — neighbors sorted by the SHARED
FACET's sorted-vertex tuple (facets are keyed and sorted before pairing),
not by neighbor index; Algorithm III then numbers a node's unnumbered
same-level neighbors by (degree, adjacency-position).
"""

from collections import defaultdict, deque

import numpy as np

__all__ = ["gps_cell_order", "dolfinx_entity_maps"]


def _dual_graph(cells: np.ndarray):
    """Cell dual graph with dolfinx ``build_dual_graph`` adjacency order:
    each cell's neighbors appear in ascending shared-facet-key order."""
    nc, nv = cells.shape
    if nv == 3:
        LE = ([1, 2], [0, 2], [0, 1])
    elif nv == 4:
        LE = ([0, 1], [1, 2], [2, 3], [3, 0])
    else:
        raise ValueError("triangle/quadrilateral cells only")
    fmap = defaultdict(list)
    for c in range(nc):
        vs = cells[c]
        for le in LE:
            fmap[tuple(sorted(vs[le]))].append(c)
    adj = [[] for _ in range(nc)]
    for key in sorted(fmap):
        cc = fmap[key]
        if len(cc) == 2:
            a, b = cc
            adj[a].append(b)
            adj[b].append(a)
    return adj


def _levels_from(adj, root, n):
    lvl = -np.ones(n, np.int64)
    lvl[root] = 0
    q = deque([root])
    while q:
        x = q.popleft()
        for y in adj[x]:
            if lvl[y] < 0:
                lvl[y] = lvl[x] + 1
                q.append(y)
    return lvl


def _components(adj, mask):
    n = len(adj)
    seen = np.zeros(n, bool)
    comps = []
    for s in range(n):
        if mask[s] and not seen[s]:
            cur = [s]
            seen[s] = True
            q = deque([s])
            while q:
                x = q.popleft()
                for y in adj[x]:
                    if mask[y] and not seen[y]:
                        seen[y] = True
                        cur.append(y)
                        q.append(y)
            comps.append(np.array(cur))
    return comps


def _pseudo_diameter(adj, n, deg):
    """GPS Algorithm I: endpoints of a pseudo-diameter, starting from a
    minimal-degree vertex."""
    v = int(np.argmin(deg))
    while True:
        lv = _levels_from(adj, v, n)
        k = lv.max()
        last = np.where(lv == k)[0]
        last = last[np.argsort(deg[last], kind="stable")]
        best_u, best_w = None, None
        improved = False
        for u in last:
            lu = _levels_from(adj, int(u), n)
            if lu.max() > k:
                v = int(u)
                improved = True
                break
            w = np.bincount(lu).max()
            if best_w is None or w < best_w:
                best_w, best_u = w, int(u)
        if not improved:
            return v, best_u, lv, _levels_from(adj, best_u, n)


def gps_cell_order(cells: np.ndarray) -> np.ndarray:
    """``order[new_id] = file_id``: dolfinx's serial cell reordering of an
    imported mesh (GPS on the dual graph; see module docstring)."""
    adj = _dual_graph(np.asarray(cells))
    n = len(adj)
    deg = np.array([len(a) for a in adj])
    v, u, lv, lu = _pseudo_diameter(adj, n, deg)
    k = lv.max()

    # Algorithm II: combined level structure (minimize width)
    pair_a, pair_b = lv, k - lu
    assigned = -np.ones(n, np.int64)
    same = pair_a == pair_b
    assigned[same] = pair_a[same]
    width = np.bincount(assigned[same], minlength=k + 1).astype(np.int64)
    comps = _components(adj, ~same)
    comps.sort(key=len, reverse=True)
    for comp in comps:
        wa = width.copy()
        np.add.at(wa, pair_a[comp], 1)
        wb = width.copy()
        np.add.at(wb, pair_b[comp], 1)
        ha = wa[np.unique(pair_a[comp])].max()
        hb = wb[np.unique(pair_b[comp])].max()
        if ha <= hb:
            assigned[comp] = pair_a[comp]
            width = wa
        else:
            assigned[comp] = pair_b[comp]
            width = wb

    # Algorithm III: numbering, starting from v; a node's unnumbered
    # same-level neighbors are numbered by (degree, adjacency position)
    if assigned[v] != 0:
        assigned = k - assigned
    order = []
    numbered = np.zeros(n, bool)

    def number(x):
        numbered[x] = True
        order.append(x)

    number(v)
    for lev in range(k + 1):
        in_lev = assigned == lev
        while True:
            progressed = False
            for w in order:
                raw = [y for y in adj[w] if in_lev[y] and not numbered[y]]
                if raw:
                    for y in sorted(
                        raw, key=lambda y: (deg[y], adj[w].index(y))
                    ):
                        number(y)
                    progressed = True
                    break
            if not progressed:
                rest = np.where(in_lev & ~numbered)[0]
                if len(rest) == 0:
                    break
                rest = rest[np.argsort(deg[rest], kind="stable")]
                number(int(rest[0]))
    return np.array(order)


def dolfinx_entity_maps(cells: np.ndarray, my_facets: np.ndarray):
    """(cell_order, facet_map, vertex_map) for an imported triangle mesh.

    * ``cell_order[dolfinx_cell] = file_cell`` (:func:`gps_cell_order`);
    * ``vertex_map[file_vertex] = dolfinx_vertex`` — first appearance in
      the reordered cell-vertex array;
    * ``facet_map[dolfinx_facet] = my_facet`` — dolfinx facets are the
      lexicographically sorted unique sorted-vertex pairs in NEW vertex
      numbering; mapped back to ``my_facets`` via the file vertex pairs.
    """
    cells = np.asarray(cells)
    order = gps_cell_order(cells)
    re_cells = cells[order]
    nv_tot = int(cells.max()) + 1
    vmap = -np.ones(nv_tot, np.int64)
    nxt = 0
    for v in re_cells.reshape(-1):
        if vmap[v] < 0:
            vmap[v] = nxt
            nxt += 1
    new_cells = vmap[re_cells]
    LE = np.array([[1, 2], [0, 2], [0, 1]])
    edges = np.sort(new_cells[:, LE].reshape(-1, 2), axis=1)
    uniq = np.unique(edges, axis=0)
    inv_vmap = np.empty(nv_tot, np.int64)
    inv_vmap[vmap] = np.arange(nv_tot)
    uniq_orig = np.sort(inv_vmap[uniq], axis=1)
    key2my = {
        tuple(f): i
        for i, f in enumerate(np.sort(np.asarray(my_facets), axis=1).tolist())
    }
    fmap = np.array([key2my[tuple(f)] for f in uniq_orig.tolist()])
    assert len(np.unique(fmap)) == len(fmap)
    return order, fmap, vmap
