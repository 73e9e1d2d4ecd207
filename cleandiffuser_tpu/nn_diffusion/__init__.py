from .base import BaseNNDiffusion, timestep_embedding_module
from .chitransformer import ChiTransformer
from .chiunet import ChiResidualBlock, ChiUNet1d
from .dit import DiT1Ref, DiT1d, DiTBlock, FinalLayer1d
from .jannerunet import JannerUNet1d, LinearAttention
from .mlps import DQLMlp, DVInvMlp, IDQLMlp, MlpNNDiffusion, NewIDQLMlp
from .pearce import PearceMlp, PearceTransformer
from .sfbc_unet import SfBCUNet
