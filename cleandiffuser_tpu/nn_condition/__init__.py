from .base import (
    BaseNNCondition,
    FourierCondition,
    IdentityCondition,
    LinearCondition,
    MLPCondition,
    MLPSieveObsCondition,
    PearceObsCondition,
    PositionalCondition,
)
