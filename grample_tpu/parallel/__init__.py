from grample_tpu.parallel.mesh import (
    ShardedChainGroup,
    chain_mesh,
    sharded_advance,
    sharded_convergence_moments,
)

__all__ = [
    "ShardedChainGroup",
    "chain_mesh",
    "sharded_advance",
    "sharded_convergence_moments",
]
