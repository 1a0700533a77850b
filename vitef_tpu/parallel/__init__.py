from .mesh import (  # noqa: F401
    ComputingConfig,
    build_computing_manager,
    build_mesh,
    get_hostname,
    get_local_rank,
    get_rank,
    get_world_size,
    is_master_process,
    param_shardings,
    shard_batch,
    shard_params,
)
from .train_step import (  # noqa: F401
    TrainState,
    cross_entropy_loss,
    init_train_state,
    make_eval_step,
    make_train_step,
)
