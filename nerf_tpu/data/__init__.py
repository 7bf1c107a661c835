from nerf_tpu.data.blender import BlenderDataset
from nerf_tpu.data.synthetic import make_synthetic_scene, write_blender_dataset
from nerf_tpu.data.sampler import LocalShuffleSampler, epoch_image_order
