from .detr import DETRKeypointModel, build_detr_model
from .resnet import ResNet, Backbone8s
from .position_encoding import PositionEmbeddingSine, PositionEmbeddingLearned
from .rtdetr import RTDETR, RTDETRConfig, convert_params_to_deploy
from .presnet import PResNet
from .hybrid_encoder import HybridEncoder, HybridEncoderModify
from .rtdetr_decoder import RTDETRTransformer
from .postprocess import postprocess, postprocess_sigma
