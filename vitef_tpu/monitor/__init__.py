from .checkpoint import (  # noqa: F401
    Checkpointer,
    CheckpointerConfig,
    load_checkpoint_params,
)
from .logger import Logger, LoggerConfig  # noqa: F401
from .orchestrator import (  # noqa: F401
    EvalOrchestratorConfig,
    OrchestratorConfig,
    RUN_DIR,
    build_eval_orchestrator,
    build_orchestrator,
)
from .profiler import StepTimer, trace  # noqa: F401
from .utility import Utility, UtilityConfig  # noqa: F401
