from meshopticalflow_tpu.parallel.sharding import (
    make_device_mesh,
    level_step_shardings,
    sharded_level_step,
    advect_texture_sharded,
)
from meshopticalflow_tpu.parallel.halo import (
    HaloCoarse,
    HaloEll,
    build_halo_coarse,
    build_halo_ell,
    halo_mg_pcg,
    halo_pcg,
)
