from .matcher import hungarian_match
from .criterion import CriterionConfig, set_criterion
