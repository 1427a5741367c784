"""Dense tensor encoding of a factor graph for the TPU Gibbs engine.

The reference walks pointer graphs per site update (``Function.Eval``
with a mixed-radix index per call, ``model/function.go:146-202``).  Here
the whole topology is compiled once into padded integer arrays so the
per-sweep compute is pure gathers + reductions, vectorized over
(chains × variables-of-a-color):

  - ``tables``         [T]          all log-space factor tables, concatenated
  - ``adj_offset``     [V+1, F]     table offset of the j-th factor of var v
  - ``adj_self_stride``[V+1, F]     stride of v inside that factor's table
  - ``adj_mask``       [V+1, F]     valid-factor mask
  - ``adj_scope_vars`` [V+1, F, S]  scope var ids of that factor (v's own
                                    position carries stride 0, so state[v]
                                    never contributes to the base index)
  - ``adj_scope_strides``[V+1,F,S]  matching strides (0 = padding)
  - ``color_vars``     [NC, G]      var ids per chromatic update group
  - ``color_mask``     [NC, G]      valid-entry mask

The conditional of var v given the rest is then, for each value k:
   logit[k] = sum_j mask[v,j] * tables[ adj_offset[v,j]
             + sum_s state[scope_vars[v,j,s]] * scope_strides[v,j,s]
             + k * adj_self_stride[v,j] ]
which is exactly the log of the reference's per-factor Eval-and-sum
(``sampler/gibbs-simple.go:186-220``) for all chains/values at once.

A sentinel padding variable lives at index V (card 1, never updated);
all index padding points at it so scatters/gathers stay in-bounds and
collision-free.  Shapes are *capacities*: every collapse variant of a
model is padded to the same ``EncodeCaps`` so one compiled sweep serves
all variants, stacked on a leading axis.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from grample_tpu.pgm.coloring import color_graph, color_groups, verify_coloring
from grample_tpu.pgm.discrete import LOG_EPS, DiscreteModel, table_strides


@dataclasses.dataclass(frozen=True)
class EncodeCaps:
    """Static shape capacities shared by all variants of one model."""

    num_vars: int  # V (without sentinel)
    max_card: int  # K
    adj_cap: int  # F: max factors per variable
    scope_cap: int  # S: max scope size
    table_cap: int  # T: flat table length
    color_cap: int  # NC: max chromatic groups
    group_cap: int  # G: max vars per group
    oa_cap: int = 1  # OA: max "other assignments" of a factor seen from
    #                  one scope var (table size / that var's card)

    def fits(self, other: "EncodeCaps") -> bool:
        return (
            self.num_vars == other.num_vars
            and self.max_card >= other.max_card
            and self.adj_cap >= other.adj_cap
            and self.scope_cap >= other.scope_cap
            and self.table_cap >= other.table_cap
            and self.color_cap >= other.color_cap
            and self.group_cap >= other.group_cap
            and self.oa_cap >= other.oa_cap
        )


def _roundup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if m > 1 else x


@dataclasses.dataclass
class EncodedModel:
    """One model variant, encoded to dense numpy arrays (see module doc)."""

    caps: EncodeCaps
    cards: np.ndarray  # [V+1] int32 (sentinel card 1)
    fixed: np.ndarray  # [V+1] int32
    collapsed: np.ndarray  # [V+1] bool
    update_ok: np.ndarray  # [V+1] bool — vars the sweep resamples
    tables: np.ndarray  # [T] float32, log space
    adj_offset: np.ndarray  # [V+1, F] int32
    adj_self_stride: np.ndarray  # [V+1, F] int32
    adj_mask: np.ndarray  # [V+1, F] bool
    adj_scope_vars: np.ndarray  # [V+1, F, S] int32
    adj_scope_strides: np.ndarray  # [V+1, F, S] int32
    color_vars: np.ndarray  # [NC, G] int32 (sentinel-padded)
    color_mask: np.ndarray  # [NC, G] bool
    num_colors: int
    # Exact marginal for collapsed vars (uniform elsewhere), padded [V+1, K]
    exact_marginals: np.ndarray  # float64
    # ---- dense color-major encoding (the MXU sweep path) -----------------
    # Seen from variable v and its j-th incident factor, the factor table
    # splits into OA "other assignments" × K own values: a LOCAL table.
    # These are pre-gathered per chromatic group so the device sweep is
    # pure einsums — no gathers or scatters touch HBM tables at runtime.
    cm_scope_vars: np.ndarray = None  # [NC, G, F, S] int32 (own pos → sentinel)
    cm_other_strides: np.ndarray = None  # [NC, G, F, S] int32 local mixed radix
    cm_local_tables: np.ndarray = None  # [NC, G, F, OA, K] f32 log (padding 0)
    cm_upd: np.ndarray = None  # [NC, G] bool
    cm_kmask: np.ndarray = None  # [NC, G, K] bool

    def arrays(self) -> dict:
        """The fields the device sweep consumes, as a dict of numpy arrays."""
        return dict(
            cards=self.cards,
            fixed=self.fixed,
            color_vars=self.color_vars,
            cm_scope_vars=self.cm_scope_vars,
            cm_other_strides=self.cm_other_strides,
            cm_local_tables=self.cm_local_tables,
            cm_upd=self.cm_upd,
            cm_kmask=self.cm_kmask,
        )

    def legacy_arrays(self) -> dict:
        """Var-major adjacency view (reference-shaped; tests/host tools)."""
        return dict(
            cards=self.cards,
            tables=self.tables,
            adj_offset=self.adj_offset,
            adj_self_stride=self.adj_self_stride,
            adj_mask=self.adj_mask,
            adj_scope_vars=self.adj_scope_vars,
            adj_scope_strides=self.adj_scope_strides,
            color_vars=self.color_vars,
            color_mask=self.color_mask,
            update_ok=self.update_ok,
            fixed=self.fixed,
        )


def compute_caps(
    m: DiscreteModel,
    headroom_factors: int = 2,
    headroom_table: int = 4096,
    group_cap: int = 0,
) -> EncodeCaps:
    """Measure a model and pick capacities with headroom for collapse
    variants (collapse replaces a var's factors with one blanket factor,
    which can have a larger scope/table than anything in the base model)."""
    v = m.num_vars
    nfac = np.zeros(v + 1, dtype=np.int64)
    max_scope = 1
    tab_total = 0
    oa_cap = 1
    for f in m.factors:
        for u in f.scope:
            nfac[int(u)] += 1
            oa_cap = max(oa_cap, int(f.table.size) // int(m.cards[int(u)]))
        max_scope = max(max_scope, int(f.scope.size))
        tab_total += int(f.table.size)

    colors = color_graph(v, [f.scope for f in m.factors])
    groups = color_groups(colors, np.asarray(m.free_mask), group_cap or 0)
    gcap = max((g.size for g in groups), default=1)

    # Collapse headroom: new factor scope = blanket-1 vars (<= 11 by the
    # NeighborVarMax=12 policy); its table can reach prod of their cards,
    # but only tables within MAX_TABLE_SIZE are ever built (the reference
    # NewFunction guard, model/function.go:59-78), so larger blankets are
    # simply not collapsible and need no headroom.
    from grample_tpu.pgm.discrete import MAX_TABLE_SIZE

    blankets = m.blankets()
    collapse_scope = 0
    collapse_table = 0
    for i, b in enumerate(blankets):
        if 1 < len(b) <= 12:
            rest = [u for u in b if u != i]
            tsize = int(np.prod(m.cards[rest], dtype=np.float64).clip(max=2 * MAX_TABLE_SIZE))
            if tsize <= MAX_TABLE_SIZE:
                collapse_scope = max(collapse_scope, len(rest))
                collapse_table = max(collapse_table, tsize)
                oa_cap = max(oa_cap, tsize // int(m.cards[rest].min()))

    return EncodeCaps(
        num_vars=v,
        max_card=m.max_card,
        adj_cap=int(nfac.max()) + headroom_factors,
        scope_cap=max(max_scope, collapse_scope),
        table_cap=_roundup(tab_total + max(collapse_table, headroom_table), 1024),
        color_cap=int(colors.max()) + 1 + 4,
        group_cap=gcap,
        oa_cap=oa_cap,
    )


def encode_model(
    m: DiscreteModel, caps: Optional[EncodeCaps] = None, group_cap: int = 0
) -> EncodedModel:
    """Encode one model (or collapse variant) against fixed capacities."""
    if caps is None:
        caps = compute_caps(m, group_cap=group_cap)
    v, k = caps.num_vars, caps.max_card
    if m.num_vars != v:
        raise ValueError("variant variable count differs from caps")
    if m.max_card > k:
        raise ValueError("variant max card exceeds caps")
    sent = v  # sentinel var index

    cards = np.ones(v + 1, dtype=np.int32)
    cards[:v] = m.cards
    fixed = np.zeros(v + 1, dtype=np.int32)
    fixed[:v] = m.fixed
    fixed[sent] = 0  # sentinel is pinned
    collapsed = np.zeros(v + 1, dtype=bool)
    collapsed[:v] = m.collapsed
    update_ok = np.zeros(v + 1, dtype=bool)
    update_ok[:v] = m.free_mask

    # ---- flat log tables + adjacency ------------------------------------
    nf = len(m.factors)
    offsets = np.zeros(nf, dtype=np.int64)
    pos = 0
    tables = np.zeros(caps.table_cap, dtype=np.float32)
    for fi, f in enumerate(m.factors):
        offsets[fi] = pos
        t = f.table
        if not f.is_log:
            t = np.log(np.where(t < LOG_EPS, t + LOG_EPS, t))
        if pos + t.size > caps.table_cap:
            raise ValueError(
                f"table capacity {caps.table_cap} exceeded at factor {fi}"
            )
        tables[pos : pos + t.size] = t.astype(np.float32)
        pos += t.size

    F, S = caps.adj_cap, caps.scope_cap
    adj_offset = np.zeros((v + 1, F), dtype=np.int32)
    adj_self_stride = np.zeros((v + 1, F), dtype=np.int32)
    adj_mask = np.zeros((v + 1, F), dtype=bool)
    adj_scope_vars = np.full((v + 1, F, S), sent, dtype=np.int32)
    adj_scope_strides = np.zeros((v + 1, F, S), dtype=np.int32)

    OA = caps.oa_cap
    adj_other_strides = np.zeros((v + 1, F, S), dtype=np.int32)
    adj_local_tables = np.zeros((v + 1, F, OA, k), dtype=np.float32)

    nseen = np.zeros(v + 1, dtype=np.int64)
    for fi, f in enumerate(m.factors):
        strides = table_strides(m.cards[f.scope])
        if f.scope.size > S:
            raise ValueError(f"factor {f.name} scope {f.scope.size} exceeds cap {S}")
        tlog = tables[offsets[fi] : offsets[fi] + f.table.size]
        shaped = tlog.reshape(tuple(int(c) for c in m.cards[f.scope]))
        for p, u in enumerate(f.scope):
            u = int(u)
            j = nseen[u]
            if j >= F:
                raise ValueError(f"var {u} has more than {F} factors")
            nseen[u] = j + 1
            adj_offset[u, j] = offsets[fi]
            adj_self_stride[u, j] = strides[p]
            adj_mask[u, j] = True
            adj_scope_vars[u, j, : f.scope.size] = f.scope
            ss = strides.copy()
            ss[p] = 0  # own position: contribution comes via k * self_stride
            adj_scope_strides[u, j, : f.scope.size] = ss
            # -- local table: [other assignments, own value] --------------
            cu = int(m.cards[u])
            local = np.moveaxis(shaped, p, -1).reshape(-1, cu)
            if local.shape[0] > OA:
                raise ValueError(
                    f"factor {f.name} local table {local.shape[0]} exceeds "
                    f"oa cap {OA}"
                )
            adj_local_tables[u, j, : local.shape[0], :cu] = local
            # local mixed-radix strides over the OTHER scope vars, laid at
            # their scope positions (own position stride 0)
            others = [q for q in range(f.scope.size) if q != p]
            ostr = table_strides(m.cards[f.scope[others]])
            ls = np.zeros(f.scope.size, dtype=np.int64)
            ls[others] = ostr
            adj_other_strides[u, j, : f.scope.size] = ls

    # ---- chromatic schedule ---------------------------------------------
    scopes = [f.scope for f in m.factors]
    colors = color_graph(v, scopes)
    verify_coloring(colors, scopes)
    groups = color_groups(colors, update_ok[:v], group_cap or caps.group_cap)
    if len(groups) > caps.color_cap:
        raise ValueError(f"{len(groups)} color groups exceed cap {caps.color_cap}")
    gcap = caps.group_cap
    if any(g.size > gcap for g in groups):
        raise ValueError("color group exceeds group capacity")

    color_vars = np.full((caps.color_cap, gcap), sent, dtype=np.int32)
    color_mask = np.zeros((caps.color_cap, gcap), dtype=bool)
    for ci, g in enumerate(groups):
        color_vars[ci, : g.size] = g
        color_mask[ci, : g.size] = True

    exact = np.zeros((v + 1, k), dtype=np.float64)
    exact[:v, : m.marginals.shape[1]] = m.marginals
    exact[sent, 0] = 1.0

    # ---- color-major dense views (the device sweep's whole topology) -----
    cm_scope_vars = adj_scope_vars[color_vars]  # [NC, G, F, S]
    cm_other_strides = adj_other_strides[color_vars]
    cm_local_tables = adj_local_tables[color_vars]  # [NC, G, F, OA, K]
    cm_upd = color_mask.copy()  # groups hold free vars only
    cm_kmask = (
        np.arange(k, dtype=np.int32)[None, None, :] < cards[color_vars][..., None]
    ) & color_mask[..., None]

    return EncodedModel(
        caps=caps,
        cards=cards,
        fixed=fixed,
        collapsed=collapsed,
        update_ok=update_ok,
        tables=tables,
        adj_offset=adj_offset,
        adj_self_stride=adj_self_stride,
        adj_mask=adj_mask,
        adj_scope_vars=adj_scope_vars,
        adj_scope_strides=adj_scope_strides,
        color_vars=color_vars,
        color_mask=color_mask,
        num_colors=len(groups),
        exact_marginals=exact,
        cm_scope_vars=cm_scope_vars,
        cm_other_strides=cm_other_strides,
        cm_local_tables=cm_local_tables,
        cm_upd=cm_upd,
        cm_kmask=cm_kmask,
    )


def stack_variants(variants: Sequence[EncodedModel]) -> dict:
    """Stack N same-caps variants into [N, ...] arrays for the vmapped sweep."""
    caps = variants[0].caps
    for enc in variants[1:]:
        if enc.caps != caps:
            raise ValueError("all variants must share identical caps")
    out: dict = {}
    for key in variants[0].arrays():
        out[key] = np.stack([enc.arrays()[key] for enc in variants])
    return out
