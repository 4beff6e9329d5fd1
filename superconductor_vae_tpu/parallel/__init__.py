from .mesh import (make_mesh, shard_batch, replicate, data_sharding,
                   tp_param_specs, shard_params_tp)
