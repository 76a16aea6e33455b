from vq_tpu.dist.mesh import make_mesh, shard_rows, replicate
from vq_tpu.dist.sharded import (
    sharded_scan_topk,
    sharded_generic_scan_topk,
    sharded_exact_topk,
    dp_lloyd_step,
)

__all__ = [
    "make_mesh",
    "shard_rows",
    "replicate",
    "sharded_scan_topk",
    "sharded_generic_scan_topk",
    "sharded_exact_topk",
    "dp_lloyd_step",
]
