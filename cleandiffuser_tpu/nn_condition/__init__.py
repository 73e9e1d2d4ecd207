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
from .images import (
    EarlyConvViTMultiViewImageCondition,
    MultiImageObsCondition,
    ResNet18,
    ResNet18ImageCondition,
    ResNet18MultiViewImageCondition,
    SmallStem,
    SpatialSoftmax,
)
