from .pusht_jax import PushTEnvJax, PushTKeypointEnvJax, PushTState
