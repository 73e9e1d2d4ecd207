from .pusht_jax import PushTEnvJax, PushTKeypointEnvJax, PushTState
from .wrapper import (
    MultiStepWrapper,
    VideoRecorder,
    VideoRecordingWrapper,
    VideoWrapper,
    make_sync_vector_env,
)
from .kitchen import ALL_KITCHEN_TASKS, KitchenLowdimWrapper, make_kitchen_env
from .robomimic import (
    RobomimicImageWrapper,
    RobomimicLowdimWrapper,
    create_robomimic_env,
)
