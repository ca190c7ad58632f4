from detection_3d_tpu.utils.checkpoint import Checkpointer
from detection_3d_tpu.utils.metric_logger import MetricLogger, SmoothedValue
from detection_3d_tpu.utils.logger import setup_logger
