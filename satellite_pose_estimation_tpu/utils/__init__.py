from .submission import SubmissionWriter
from .metric_logger import SmoothedValue, MetricLogger
