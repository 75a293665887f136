from .mesh import (DATA_AXIS, make_mesh, replicate, shard_batch,
                   reorder_two_stream, reorder_two_stream_steps,
                   shard_step_chunk, touch_tree,
                   pmean_if_parallel, psum_if_parallel,
                   fold_rng, parallel_step, parallel_eval_step,
                   parallel_multi_step, batch_sharding, replicate_sharding)
from . import multihost
from . import spatial
from .spatial import (SPATIAL_AXIS, make_mesh_2d, is_spatial_mesh,
                      data_axis_size, shard_train_batch, shard_train_chunk,
                      gspmd_train_step, gspmd_multi_step)
