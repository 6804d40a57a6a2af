from .mesh import (
    DPBatch,
    DPOptState,
    dp_mapping_step,
    dp_refine_step,
    make_dp_opt_state,
    make_mesh,
    shard_batch,
)

__all__ = [
    "DPBatch",
    "DPOptState",
    "dp_mapping_step",
    "dp_refine_step",
    "make_dp_opt_state",
    "make_mesh",
    "shard_batch",
]
