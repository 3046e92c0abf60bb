from fast_neural_style_transfer_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh_plan,
    shard_map_checked,
)

__all__ = ["MeshPlan", "make_mesh_plan", "shard_map_checked"]
