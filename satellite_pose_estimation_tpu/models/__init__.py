from .detr import DETRKeypointModel, build_detr_model
from .resnet import ResNet, Backbone8s
from .position_encoding import PositionEmbeddingSine, PositionEmbeddingLearned
