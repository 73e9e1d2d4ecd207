from .pusht_jax import PushTEnvJax, PushTKeypointEnvJax, PushTState
from .wrapper import (
    MultiStepWrapper,
    VideoRecorder,
    VideoRecordingWrapper,
    VideoWrapper,
    make_sync_vector_env,
)
