from nerf_tpu.train.config import PipelineConfig
from nerf_tpu.train import losses, schedule, pipeline, step, renderer
