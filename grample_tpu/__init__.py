"""grample_tpu — a TPU-native framework for discrete PGM marginal inference.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CraigKelly/grample (adaptive Rao-Blackwellised Gibbs sampling for the UAI
"MAR" task, AISTATS 2019 "kelly19a").  Where the reference runs one
sequential random-scan chain per CPU goroutine, this framework runs
thousands of vectorized chains per TPU chip using chromatic (graph-colored)
parallel Gibbs over dense HBM/VMEM-resident factor tables, samples with
Gumbel-max in log space, and shards chains over a `jax.sharding.Mesh`.

Layer map (bottom-up), mirroring the reference layer map (SURVEY.md §1):

  - ``grample_tpu.uai``      — UAI file format I/O (reference: model/uai.go)
  - ``grample_tpu.pgm``      — model core: variables/factors/validation,
                               dense tensor encoding, graph coloring
                               (reference: model/*.go)
  - ``grample_tpu.metrics``  — error suite + PSRF convergence
                               (reference: model/error.go, sampler/chain.go)
  - ``grample_tpu.ops``      — the compute path: XLA + Pallas Gibbs sweeps
                               (reference: sampler/gibbs-simple.go hot loop)
  - ``grample_tpu.sampler``  — chain runtime, collapse engine, adaptive
                               controller (reference: sampler/*.go)
  - ``grample_tpu.parallel`` — mesh/sharding/collectives (reference:
                               goroutines + WaitGroup, §2 parallelism table)
  - ``grample_tpu.cli``      — CLI + orchestration (reference: cmd/*.go)
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compile_cache() -> None:
    """Point JAX at an on-disk XLA compilation cache.

    The bench and the acceptance suite run every phase in a fresh
    subprocess (the tunneled TPU worker can die after long multi-phase
    sessions), which discards the in-memory executable cache; first
    compiles cost 20-40s each.  A persistent cache makes retries and
    repeated (net, mode) shapes near-free across processes.  Opt out
    with GRAMPLE_NO_COMPILE_CACHE=1 (tests on ephemeral CI disks).
    """
    if _os.environ.get("GRAMPLE_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        # never override a cache dir the embedding application configured
        # (env var or an earlier jax.config.update) — ADVICE r2
        if _os.environ.get("JAX_COMPILATION_CACHE_DIR") or getattr(
            jax.config, "jax_compilation_cache_dir", None
        ):
            return
        cache = _os.environ.get(
            "GRAMPLE_COMPILE_CACHE",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "grample_tpu", "xla"
            ),
        )
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a failure
        pass


_enable_persistent_compile_cache()

from grample_tpu.pgm.discrete import DiscreteModel, Factor  # noqa: F401
