from .crop import (
    generate_clip_bbox_val,
    generate_clip_bbox_train,
    generate_clip_bbox_submission,
    truncnorm_sample,
)
from .annotations import (
    load_train_annotations,
    load_index_file,
    load_detector_boxes,
    load_ground_truth,
)
from .dataset import SpeedTrainDataset, SpeedSubmissionDataset, IMAGENET_MEAN, IMAGENET_STD
from .coco import CocoDetection, CocoEvaluator
from .cifar10 import CIFAR10
from .augment import AugmentConfig, augment_batch, augment_batch_pallas
