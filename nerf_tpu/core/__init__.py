from nerf_tpu.core import rays, encoding, sampling, render
