from nerf_tpu.parallel.mesh import make_mesh, initialize_distributed
from nerf_tpu.parallel.dp import (
    make_parallel_epoch_step,
    make_parallel_train_step,
    stack_state,
    unstack_params,
)
from nerf_tpu.parallel.model_average import make_average_fn, AVERAGE_STRATEGIES
