"""Chain runtime: batched chains over stacked collapse variants.

The reference's ``Chain`` owns one model clone + sampler + ring-buffer
history and advances in its own goroutine (``sampler/chain.go``).  Here
the unit of parallelism is inverted for the TPU: ONE device program
advances every chain of every model variant at once —

  - variant slot axis  [N]: distinct factor graphs (base model, plus one
    slot per adaptively collapsed variable — the reference's "chain"),
  - micro-chain axis   [C]: independent chains per variant (the
    vectorization the reference lacks entirely),

with state ``[N, C, V+1]`` and split-half window counts ``[N, 2, C,
V+1, K]`` resident on device.  Slot capacity grows in powers of two so
recompiles happen O(log MaxChains) times per run, never per adapt step.

``MergeChains`` (``chain.go:96-148``) becomes a host-side reduction of
per-slot count totals, with the reference's exact semantics: a variable
collapsed in ANY variant uses that variant's exact (Rao-Blackwellised)
marginal outright; every chain contributes its uniform-initialized
marginal (1/card per entry) plus its counts.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from grample_tpu.metrics.psrf import chain_convergence
from grample_tpu.ops.gibbs_pallas import (
    advance_chains_pallas,
    pallas_eligible,
    pallas_stack,
    pick_block,
)
from grample_tpu.ops.gibbs_xla import advance_chains
from grample_tpu.pgm.discrete import DiscreteModel
from grample_tpu.pgm.encode import (
    EncodeCaps,
    EncodedModel,
    compute_caps,
    encode_model,
    merge_caps,
    stack_variants,
)

MAX_VARIANTS = 128  # reference ConvergenceSampler.MaxChains (adaptive.go:49)

#: Variant slots advance in fixed-size chunks: ONE compiled program (the
#: chunk shape never changes) while inactive reserved slots cost nothing —
#: r1 advanced the full padded slot capacity every window, so a freshly
#: started adaptive run with 2 of 128 reserved slots burned 64x the
#: needed compute (and its burn-in blew the whole time budget).
CHUNK_SLOTS = 8


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class ChainGroup:
    """All chains of a run: stacked variants × micro-chains on device."""

    def __init__(
        self,
        base_model: DiscreteModel,
        chains_per_variant: int,
        converge_window: int,
        seed: int = 0,
        caps: Optional[EncodeCaps] = None,
        group_cap: int = 0,
        max_variants: int = MAX_VARIANTS,
        collapse_headroom: bool = False,
        use_pallas: Optional[bool] = None,
    ):
        base_model.check()
        self.base = base_model
        self.cpv = int(chains_per_variant)
        self.cw = int(converge_window)
        self.seed = int(seed)
        self.max_variants = max_variants
        self.caps = caps or compute_caps(
            base_model,
            group_cap=group_cap,
            collapse_headroom=collapse_headroom,
            slot_hint=max_variants if collapse_headroom else 1,
        )
        # rbg: counter-based, vastly cheaper per bit on TPU than threefry
        # (the sweep draws one uniform per site); deterministic per seed.
        self.key = jax.random.key(seed, impl="rbg")
        self._step = 0
        self._refresh_pallas(use_pallas)
        self._want_pallas = use_pallas

        self.variants: List[DiscreteModel] = []
        self.encs: List[EncodedModel] = []
        self.slot_cap = 0
        self.stack = None  # device dict [Ncap, ...]
        self.state = None  # [Ncap, C, V+1] int32
        self.halves = None  # [Ncap, 2, C, V+1, K] float32
        self.totals: Optional[np.ndarray] = None  # host f64 [Ncap, V+1, K]
        self.total_samples = 0  # counted site updates across all chains
        self.total_sweeps = 0

    # ---- capacity management --------------------------------------------
    @property
    def num_variants(self) -> int:
        return len(self.variants)

    @property
    def num_chains(self) -> int:
        return self.num_variants * self.cpv

    @property
    def v1(self) -> int:
        return self.caps.num_vars + 1

    @property
    def kdim(self) -> int:
        return self.caps.max_card

    def _next_key(self):
        self._step += 1
        return jax.random.fold_in(self.key, self._step)

    def _refresh_pallas(self, want: Optional[bool]):
        """Re-evaluate Pallas-kernel eligibility (caps may have grown)."""
        auto = pallas_eligible(self.caps) and self.cpv % pick_block(self.caps) == 0
        self.use_pallas = auto if want is None else (want and auto)
        self.pal_block = pick_block(self.caps) if self.use_pallas else 0
        self.pal_stack = None

    def _encode(self, model: DiscreteModel) -> EncodedModel:
        """Encode against shared caps, growing caps (and re-encoding all
        existing variants) if the new variant doesn't fit."""
        try:
            return encode_model(model, self.caps)
        except ValueError:
            grown = merge_caps(self.caps, compute_caps(model))
            self.caps = grown
            self._refresh_pallas(self._want_pallas)
            self.encs = [encode_model(mv, grown) for mv in self.variants]
            self._restack()
            return encode_model(model, grown)

    def _host_init_state(
        self, enc: EncodedModel, warm_marginals: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Initial [C, V+1] states on the host (no device compile).

        Free vars uniform (or drawn from ``warm_marginals`` [V(+1), K] —
        the warm restart for adaptively added chains); evidence pinned.
        """
        rng = np.random.default_rng(self._step * 7919 + 13)
        self._step += 1
        cards = np.asarray(enc.cards, dtype=np.int64)  # [V+1]
        v1 = cards.size
        if warm_marginals is None:
            u = rng.random((self.cpv, v1))
            draw = np.floor(u * cards[None, :]).astype(np.int32)
        else:
            k = self.kdim
            probs = np.zeros((v1, k), dtype=np.float64)
            probs[: warm_marginals.shape[0], : warm_marginals.shape[1]] = warm_marginals
            valid = np.arange(k)[None, :] < cards[:, None]
            probs = np.where(valid, np.maximum(probs, 1e-12), 0.0)
            probs /= probs.sum(axis=1, keepdims=True)
            cdf = np.cumsum(probs, axis=1)  # [V+1, K]
            u = rng.random((self.cpv, v1, 1))
            draw = (u > cdf[None]).sum(axis=2).astype(np.int32)
            draw = np.minimum(draw, (cards - 1)[None, :]).astype(np.int32)
        fixedv = np.asarray(enc.fixed, dtype=np.int32)
        return np.where(fixedv[None, :] >= 0, fixedv[None, :], draw)

    def _alloc_halves(self):
        """Window count buffer (subclasses allocate it sharded)."""
        return jnp.zeros(
            (self.slot_cap, 2, self.cpv, self.v1, self.kdim), dtype=jnp.float32
        )

    def reserve(self, n_slots: int):
        """Pre-size slot capacity to avoid intermediate restacks/compiles."""
        cap = _next_pow2(max(1, n_slots))
        if cap > self.slot_cap:
            self._restack(cap)

    def _restack(self, new_slot_cap: Optional[int] = None):
        """Rebuild stacked device arrays, preserving live slot state."""
        if new_slot_cap is not None:
            self.slot_cap = new_slot_cap
        if self.slot_cap == 0:
            return
        base_enc = self.encs[0] if self.encs else encode_model(self.base, self.caps)
        padded = list(self.encs) + [base_enc] * (self.slot_cap - len(self.encs))
        stack_np = stack_variants(padded[: self.slot_cap])
        self.stack = {k: jnp.asarray(v) for k, v in stack_np.items()}
        if self.use_pallas:
            self.pal_stack = {
                k: jnp.asarray(v)
                for k, v in pallas_stack(padded[: self.slot_cap]).items()
            }

        old = None if self.state is None else np.asarray(self.state)
        new_state = np.stack(
            [
                self._host_init_state(padded[i])
                for i in range(self.slot_cap)
            ]
        )
        if old is not None:
            n = min(old.shape[0], self.slot_cap)
            new_state[:n, :, :] = old[:n, :, :]
        self.state = jnp.asarray(new_state)
        self.halves = self._alloc_halves()
        old_tot = self.totals
        self.totals = np.zeros((self.slot_cap, self.v1, self.kdim), dtype=np.float64)
        if old_tot is not None:
            n = min(old_tot.shape[0], self.slot_cap)
            self.totals[:n, :, : old_tot.shape[2]] = old_tot[:n]

    def add_variant(
        self,
        model: DiscreteModel,
        burn_sweeps: int = 0,
        warm_marginals: Optional[np.ndarray] = None,
    ) -> int:
        """Add a model variant (a logical chain); returns its slot index.

        ``warm_marginals`` [V, K] draws the slot's initial states from the
        current merged estimate — the reference's warm restart for
        adaptively added chains; otherwise uniform init.  ``burn_sweeps``
        runs uncounted sweeps afterwards (reference burnIn).
        """
        if self.num_variants >= self.max_variants:
            raise RuntimeError(f"variant limit {self.max_variants} reached")
        enc = self._encode(model)
        slot = len(self.variants)
        self.variants.append(model)
        self.encs.append(enc)
        if slot >= self.slot_cap:
            self._restack(_next_pow2(slot + 1))
        else:
            # refresh the one changed slot on device
            arrays = enc.arrays()
            self.stack = {
                k: self.stack[k].at[slot].set(jnp.asarray(v))
                for k, v in arrays.items()
            }
            if self.use_pallas:
                pal = pallas_stack([enc])
                self.pal_stack = {
                    k: self.pal_stack[k].at[slot].set(jnp.asarray(v[0]))
                    for k, v in pal.items()
                }
        # (re)initialize this slot's chains on the host
        st = self._host_init_state(enc, warm_marginals)
        self.state = self.state.at[slot].set(jnp.asarray(st))
        self.totals[slot] = 0.0
        if burn_sweeps > 0:
            self.burn(burn_sweeps)
        return slot

    # ---- advancing -------------------------------------------------------
    def _chain_mask(self) -> np.ndarray:
        m = np.zeros(self.slot_cap, dtype=bool)
        m[: self.num_variants] = True
        return m

    def _advance_chunk(self, stack_c, pal_c, st, hv, ck, sweeps, half, count):
        if self.use_pallas:
            try:
                return advance_chains_pallas(
                    stack_c, pal_c, st, hv, ck, sweeps, half, count=count,
                    cb=self.pal_block,
                )
            except Exception:  # noqa: BLE001 — Mosaic compile/VMEM errors
                # the VMEM estimate is heuristic; if the kernel doesn't
                # actually compile/fit, fall back to the XLA sweep for the
                # rest of the run (inputs are intact: donation only takes
                # effect on successful execution)
                self.use_pallas = False
        return advance_chains(stack_c, st, hv, ck, sweeps, half, count=count)

    def _advance_fn(self, sweeps: int, half: int, count: bool):
        """Advance the ACTIVE slot prefix, chunked (see CHUNK_SLOTS)."""
        chunk = min(CHUNK_SLOTS, self.slot_cap)
        active = max(1, self.num_variants)
        p = ((active + chunk - 1) // chunk) * chunk
        key = self._next_key()
        states, halves = [], []
        for c0 in range(0, p, chunk):
            sl = slice(c0, c0 + chunk)
            st, hv = self._advance_chunk(
                {k: v[sl] for k, v in self.stack.items()},
                None if self.pal_stack is None
                else {k: v[sl] for k, v in self.pal_stack.items()},
                self.state[sl],
                self.halves[sl],
                jax.random.fold_in(key, c0),
                sweeps,
                half,
                count,
            )
            states.append(st)
            halves.append(hv)
        if p < self.slot_cap:
            states.append(self.state[p:])
            halves.append(self.halves[p:])
        self.state = jnp.concatenate(states) if len(states) > 1 else states[0]
        self.halves = jnp.concatenate(halves) if len(halves) > 1 else halves[0]

    def warmup(self):
        """Compile AND first-execute both sweep programs, side-effect free.

        Sweep counts are traced, so these two compiles serve every window
        and burn-in size.  Engines call it before anchoring time budgets:
        a cold TPU compile can take minutes, and on tunneled devices the
        first *execution* of a program carries a one-time cost too —
        so run one real sweep of each program, force a host sync, then
        restore the exact prior state/window/RNG (bit-exact neutrality).
        """
        if self.slot_cap == 0:
            return
        step = self._step
        state_h = np.asarray(self.state)
        halves_h = np.asarray(self.halves)
        self._advance_fn(1, 0, count=True)
        self._advance_fn(1, 1, count=False)
        np.asarray(self.halves)  # sync: wait out first-run overheads
        self.state = jnp.asarray(state_h)
        self.halves = jnp.asarray(halves_h)
        self._step = step

    def burn(self, sweeps: int):
        """Uncounted sweeps for all chains (burn-in)."""
        if sweeps <= 0 or self.slot_cap == 0:
            return
        self._advance_fn(int(sweeps), int(sweeps), count=False)
        self.total_sweeps += sweeps

    def advance(self, sweeps: Optional[int] = None) -> int:
        """Advance all chains one convergence window (counted).

        Resets and refills the split-half window tensors, adds the window
        counts into the running totals, and returns site updates taken.
        ``sweeps=0`` is a warmup: it compiles the counted-window program
        (num_sweeps is traced, so the compile serves every window size)
        without advancing anything.
        """
        sweeps = self.cw if sweeps is None else int(sweeps)
        self.halves = jnp.zeros_like(self.halves)
        self._advance_fn(sweeps, sweeps // 2, count=True)
        delta = np.asarray(self.halves.sum(axis=(1, 2)), dtype=np.float64)
        active = self._chain_mask()
        delta[~active] = 0.0
        self.totals += delta
        self.total_sweeps += sweeps
        taken = int(delta.sum())
        self.total_samples += taken
        return taken

    # ---- estimation ------------------------------------------------------
    def collapsed_any(self) -> np.ndarray:
        """[V] bool: collapsed in any active variant."""
        v = self.caps.num_vars
        out = np.zeros(v, dtype=bool)
        for mv in self.variants:
            out |= mv.collapsed[:v]
        return out

    def merged_marginals(self) -> np.ndarray:
        """Merged (unnormalized) marginal estimate [V, K] float64.

        Reference MergeChains semantics: per chain, marginal = uniform
        1/card seed + counts; summed across chains; any-collapsed wins
        with its exact marginal (first collapsing variant in slot order).
        """
        v, k = self.caps.num_vars, self.kdim
        cards = self.base.cards
        valid = np.arange(k)[None, :] < cards[:, None]
        uniform = valid / np.maximum(cards[:, None], 1)
        merged = self.num_chains * uniform + self.totals[: self.num_variants, :v].sum(axis=0)
        # collapsed override in slot order, first-found wins (matches the
        # reference's break-on-found in MergeChains)
        seen = np.zeros(v, dtype=bool)
        for mv in self.variants:
            for var in np.nonzero(mv.collapsed[:v] & ~seen)[0]:
                merged[var] = 0.0
                merged[var, : mv.marginals.shape[1]] = mv.marginals[var]
                seen[var] = True
        return merged

    def convergence(self, measure: str = "hellinger", merged: Optional[np.ndarray] = None) -> np.ndarray:
        """Per-variable PSRF over all micro-chains. Returns [V] float."""
        v = self.caps.num_vars
        if merged is None:
            merged = self.merged_marginals()
        h = self.halves[:, :, :, :v, :]  # [Ncap, 2, C, V, K]
        m_chains = self.slot_cap * self.cpv
        h1 = h[:, 0].reshape(m_chains, v, self.kdim)
        h2 = h[:, 1].reshape(m_chains, v, self.kdim)
        cmask = np.repeat(self._chain_mask(), self.cpv)
        converged = (self.base.fixed >= 0) | self.collapsed_any()
        vals = chain_convergence(
            h1,
            h2,
            jnp.asarray(merged, dtype=jnp.float32),
            jnp.asarray(self.base.cards, dtype=jnp.int32),
            jnp.asarray(converged),
            jnp.asarray(cmask),
            jnp.asarray(self.cw, dtype=jnp.float32),
            measure=measure,
        )
        return np.asarray(vals, dtype=np.float64)
