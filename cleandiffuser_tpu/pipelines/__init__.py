from .adaptdiffuser import AdaptDiffuserPipeline
from .consistency_policy import ConsistencyPolicyPipeline
from .dbc import DBCPipeline
from .dd import DDPipeline
from .diffuser import DiffuserPipeline
from .diffuserlite import DiffuserLitePipeline, compute_temporal_horizons
from .dp import DPPipeline
from .dql import DQLPipeline
from .edp import EDPPipeline
from .idql import IDQLPipeline
from .qgpo import QGPOPipeline
from .sfbc import SfBCPipeline
from .synther import SynthERPipeline, TD3BC
from .veteran import VeteranPipeline
