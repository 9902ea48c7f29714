from .dp import init_trackers_batch, render_segments, segment_bounds
from .halo import crop_halo_rows, halo_exchange_rows
from .pp import TwoStagePipeline
from .mesh import frame_dp_sharding, make_mesh, replicated, spatial_sharding
from .tp import shard_params, vit_param_spec
