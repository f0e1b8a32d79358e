from hybrid_gmres_tpu.parallel.mesh import make_mesh
from hybrid_gmres_tpu.parallel.sharded import (
    shard_problem,
    sharded_ba_matvec,
    sharded_ab_matvec,
    ba_gmres_sharded,
)
from hybrid_gmres_tpu.parallel.sharded_full import (
    ba_gmres_sharded_basis,
    ab_gmres_sharded_basis,
)
from hybrid_gmres_tpu.parallel.sharded_pallas import (
    ShardedBlockELL,
    ba_gmres_sharded_pallas,
    shard_block_ell,
)
from hybrid_gmres_tpu.parallel.multihost import initialize_multihost

__all__ = [
    "make_mesh",
    "shard_problem",
    "sharded_ba_matvec",
    "sharded_ab_matvec",
    "ba_gmres_sharded",
    "ba_gmres_sharded_basis",
    "ab_gmres_sharded_basis",
    "ShardedBlockELL",
    "ba_gmres_sharded_pallas",
    "shard_block_ell",
    "initialize_multihost",
]
