from .dp import DataParallelEngine, fsdp_shard_params
from .mesh import P, batch_sharded, make_mesh, replicated, shard_batch
from .sample import shard_sample_fn
