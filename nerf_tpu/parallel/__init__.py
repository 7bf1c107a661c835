from nerf_tpu.parallel.mesh import (
    host_to_global,
    initialize_distributed,
    make_mesh,
    replicate_tree,
    tree_to_host,
)
from nerf_tpu.parallel.dp import (
    make_parallel_epoch_step,
    make_parallel_train_step,
    restage_state,
    stack_state,
    unstack_params,
)
from nerf_tpu.parallel.model_average import make_average_fn, AVERAGE_STRATEGIES
