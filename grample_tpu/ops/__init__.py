from grample_tpu.ops.gibbs_xla import advance_chains, init_state  # noqa: F401
