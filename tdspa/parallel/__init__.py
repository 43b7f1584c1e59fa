from tdspa.parallel.mesh import make_mesh, default_mesh
from tdspa.parallel.shardings import (
    batch_sharding,
    replicated,
    query_sharded_batch_spec,
    train_batch_spec,
)
