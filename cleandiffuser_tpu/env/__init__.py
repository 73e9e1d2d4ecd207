from .pusht_jax import PushTEnvJax, PushTKeypointEnvJax, PushTState
from .wrapper import (
    MultiStepWrapper,
    VideoRecorder,
    VideoRecordingWrapper,
    VideoWrapper,
    make_sync_vector_env,
)
from .kitchen import ALL_KITCHEN_TASKS, KitchenLowdimWrapper, make_kitchen_env
from .block_pushing_jax import (
    BlockPushEnvJax,
    BlockPushMultimodalEnvJax,
    BlockPushState,
    generate_blockpush_demos,
    generate_blockpush_discontinuous_demos,
    generate_blockpush_reach_demos,
)
from .async_vector import make_async_vector_env
from .d4rl_eval import (
    AntMazeD4RLWrapper,
    PointMazeD4RLWrapper,
    make_antmaze_env,
    make_maze2d_env,
)
from .robomimic import (
    RobomimicImageWrapper,
    RobomimicLowdimWrapper,
    create_robomimic_env,
)
