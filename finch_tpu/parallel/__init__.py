"""Device-mesh parallelism: sharded sketching and sharded distance.

The reference's only concurrency is a rayon thread pool over input files
(/root/reference/lib/src/lib.rs:34-47). Here the equivalents are first-class
mesh programs: data-parallel k-mer streams with exact bottom-k merge
collectives, and reference-DB sharding for query/all-vs-all distance.
"""

from finch_tpu.parallel.mesh import make_mesh
from finch_tpu.parallel.sharded_sketch import ShardedSketchEngine
from finch_tpu.parallel.sharded_dist import all_vs_all_arrays
from finch_tpu.parallel import distributed

__all__ = ["make_mesh", "ShardedSketchEngine", "all_vs_all_arrays",
           "distributed"]
