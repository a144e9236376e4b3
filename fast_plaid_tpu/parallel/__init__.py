"""Multi-chip scaling over a jax.sharding.Mesh.

New capability relative to the reference, whose multi-GPU story is
host-side query splitting over fully replicated indexes
(reference: python/fast_plaid/search/fast_plaid.py:894-928, SURVEY.md §5.8).
Here both modes are SPMD programs over a device mesh:

* document sharding (parallel/sharded.py): IVF/codes/residuals partitioned
  by document across chips, each chip searches its shard, and per-chip
  top-k merge rides an ICI all-gather (k * B floats+ids, tiny);
* query sharding (parallel/sharded.py: query_sharded_search): index
  replicated, the query batch partitioned by the compiler via shardings;
* 2-D (replica x shard) meshes (parallel/mesh2d.py): doc-sharded groups
  replicated along a second axis that splits the query batch — capacity
  and throughput scaling composed, with shard-group-local collectives.
"""

from fast_plaid_tpu.parallel.api import ShardedFastPlaid
from fast_plaid_tpu.parallel.mesh import make_mesh
from fast_plaid_tpu.parallel.mesh2d import (
    make_mesh_2d,
    replicate_sharded_index,
    sharded_search_2d,
)
from fast_plaid_tpu.parallel.lm_sharded import (
    ShardedLowMemory,
    load_sharded_lm,
)
from fast_plaid_tpu.parallel.sharded import (
    ShardedIndex,
    build_sharded_index,
    query_sharded_search,
    sharded_search,
)

__all__ = [
    "ShardedFastPlaid",
    "make_mesh",
    "ShardedIndex",
    "build_sharded_index",
    "sharded_search",
    "query_sharded_search",
    "ShardedLowMemory",
    "load_sharded_lm",
    "make_mesh_2d",
    "replicate_sharded_index",
    "sharded_search_2d",
]
