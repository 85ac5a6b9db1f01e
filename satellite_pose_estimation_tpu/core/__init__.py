from .registry import register, create, GLOBAL_CONFIG
from .yaml_utils import load_config, merge_dict
from .yaml_config import YAMLConfig
