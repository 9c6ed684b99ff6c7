"""Flax model modules for the Track4D network family."""

from .layers import MaskedBatchNorm, PointwiseMLP, WeightNet, StackedGRU
from .pnhead import PNHead, SetAbstractionMSG, FeaturePropagation
from .correlator import FeatureCorrelator
from .decoder import FlowDecoder, FlowPredictor, ClsPredictor
from .affinity import Affinity
from .track4d import Track4D, model_from_config

__all__ = [
    "MaskedBatchNorm", "PointwiseMLP", "WeightNet", "StackedGRU",
    "PNHead", "SetAbstractionMSG", "FeaturePropagation",
    "FeatureCorrelator", "FlowDecoder", "FlowPredictor", "ClsPredictor",
    "Affinity", "Track4D", "model_from_config",
]
