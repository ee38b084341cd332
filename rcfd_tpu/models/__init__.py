from .fusionnet import FusionNetModel
from .radarnet import RadarNetModel
from .networks import (ResNetEncoder, FusionNetEncoder, FullyConnectedEncoder,
                       RadarNetV1Encoder, ResNetBasedEncoder, MultiScaleDecoder)
from . import losses
