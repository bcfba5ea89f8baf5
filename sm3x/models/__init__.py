from sm3x.models.resnet import build_resnet, feat_dim, ResNet
from sm3x.models.projector import SSLProjector, MultiLabelProjector
from sm3x.models.transformer import TransformerEncoderLayer, MultiheadSelfAttention
from sm3x.models.simclr import (
    SimCLRBranch,
    SimCLRSkin,
    SimCLRSkinV2,
    SimCLRSkinV3,
    SimCLRSkinV32,
    build_ssl_model,
)
from sm3x.models.mlc import MLCHead, Prototypes, MLCModel, DualExtractor
from sm3x.models.baseline import (
    Baseline,
    SingleBaseline,
    MultiHeadClassifier,
    LogisticRegressEvaluator,
    MLPHead,
)

__all__ = [
    "build_resnet",
    "feat_dim",
    "ResNet",
    "SSLProjector",
    "MultiLabelProjector",
    "TransformerEncoderLayer",
    "MultiheadSelfAttention",
    "SimCLRBranch",
    "SimCLRSkin",
    "SimCLRSkinV2",
    "SimCLRSkinV3",
    "SimCLRSkinV32",
    "build_ssl_model",
    "MLCHead",
    "Prototypes",
    "MLCModel",
    "DualExtractor",
    "Baseline",
    "SingleBaseline",
    "MultiHeadClassifier",
    "LogisticRegressEvaluator",
    "MLPHead",
]
