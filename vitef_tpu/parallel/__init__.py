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
from .pipeline import (  # noqa: F401
    build_pipeline_mesh,
    make_pipeline_train_step,
    pipeline_state_shardings,
    stack_block_params,
    unstack_block_params,
)
from .moe import (  # noqa: F401
    apply_moe_ffn,
    apply_moe_ffn_ep,
    apply_moe_ffn_ep_sparse,
    apply_moe_ffn_sparse,
    init_moe_ffn,
    make_moe_ep_train_step,
    moe_ep_state_shardings,
    moe_param_shardings,
    resolve_moe_impl,
    router_aux,
)
from .sequence import (  # noqa: F401
    apply_transformer_sp,
    build_sp_mesh,
    make_sp_train_step,
    ring_attention,
)
from .train_step import (  # noqa: F401
    TrainState,
    cross_entropy_loss,
    init_train_state,
    make_eval_step,
    make_train_step,
)
