from .base import BaseNNDiffusion, timestep_embedding_module
from .mlps import DQLMlp, DVInvMlp, IDQLMlp, MlpNNDiffusion, NewIDQLMlp
