from hybrid_gmres_tpu.parallel.mesh import (make_mesh, make_mesh_2d,
                                            make_replica_meshes)
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
from hybrid_gmres_tpu.parallel.panels import (
    PanelsWithAdjoint,
    build_panels_with_adjoint,
    ComposedPanels,
    ShardedPanels,
    comms_bytes_per_iteration,
    shard_bucketed_panels,
)
from hybrid_gmres_tpu.parallel.sharded_pallas import (
    ab_gmres_sharded_pallas,
    ab_gmres_sharded_pallas_restarted,
    ba_gmres_sharded_pallas,
    ba_gmres_sharded_pallas_restarted,
)
from hybrid_gmres_tpu.parallel.sharded_batched import (
    ab_gmres_sharded_batched,
    ba_gmres_sharded_batched,
)
from hybrid_gmres_tpu.parallel.sharded_batched2d import (
    ab_gmres_sharded_batched_2d,
    ba_gmres_sharded_batched_2d,
)
from hybrid_gmres_tpu.parallel.sharded_rtp import (
    ab_gmres_rtp_sharded,
    ba_gmres_rtp_sharded,
)
from hybrid_gmres_tpu.parallel.sharded_gkb2d import (
    hybrid_lsmr_sharded_2d,
    hybrid_lsqr_sharded_2d,
    lsmr_sharded_2d,
    lsqr_sharded_2d,
)
from hybrid_gmres_tpu.parallel.sharded_gkb import (
    hybrid_lsmr_sharded,
    hybrid_lsqr_sharded,
    lsmr_sharded,
    lsqr_sharded,
)
from hybrid_gmres_tpu.parallel.sharded2d import (
    ba_gmres_sharded_2d,
    shard_problem_2d,
)
from hybrid_gmres_tpu.parallel.panels2d import (
    TiledPanels,
    ab_gmres_sharded_pallas_2d,
    ab_gmres_sharded_pallas_2d_restarted,
    ba_gmres_sharded_pallas_2d,
    ba_gmres_sharded_pallas_2d_restarted,
    comms_bytes_per_iteration_2d,
    tile_backprojector_forward,
    tile_bucketed_panels,
)
from hybrid_gmres_tpu.parallel.multihost import initialize_multihost

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_replica_meshes",
    "ba_gmres_sharded_2d",
    "shard_problem_2d",
    "TiledPanels",
    "tile_bucketed_panels",
    "tile_backprojector_forward",
    "ba_gmres_sharded_pallas_2d",
    "ab_gmres_sharded_pallas_2d",
    "ba_gmres_sharded_pallas_2d_restarted",
    "ab_gmres_sharded_pallas_2d_restarted",
    "comms_bytes_per_iteration_2d",
    "shard_problem",
    "sharded_ba_matvec",
    "sharded_ab_matvec",
    "ba_gmres_sharded",
    "ba_gmres_sharded_basis",
    "ab_gmres_sharded_basis",
    "ShardedPanels",
    "PanelsWithAdjoint",
    "build_panels_with_adjoint",
    "ComposedPanels",
    "shard_bucketed_panels",
    "comms_bytes_per_iteration",
    "ba_gmres_sharded_pallas",
    "ab_gmres_sharded_pallas",
    "ba_gmres_sharded_pallas_restarted",
    "ab_gmres_sharded_pallas_restarted",
    "ba_gmres_sharded_batched",
    "ab_gmres_sharded_batched",
    "ba_gmres_sharded_batched_2d",
    "ab_gmres_sharded_batched_2d",
    "ba_gmres_rtp_sharded",
    "ab_gmres_rtp_sharded",
    "lsqr_sharded",
    "hybrid_lsqr_sharded",
    "lsmr_sharded",
    "hybrid_lsmr_sharded",
    "lsqr_sharded_2d",
    "hybrid_lsqr_sharded_2d",
    "lsmr_sharded_2d",
    "hybrid_lsmr_sharded_2d",
    "initialize_multihost",
]
